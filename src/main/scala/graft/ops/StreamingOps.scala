package graft.ops

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowing. The reference's "streaming" story is its incremental
  * mode — a batch micro-snapshot with an inclusive watermark
  * (mkpipe_extractor_clickhouse/__init__.py:86-91,110-115, at-least-once).
  * The engine adds the Structured Streaming window family. Windows over
  * event-time are identical in batch and streaming for closed input, so the
  * oracle-checked versions here run the same `window()`/`session_window()`
  * expressions in batch; `StreamingSpec` runs them through MemoryStream with
  * `withWatermark` to assert the true streaming semantics (late-data drop).
  *
  * Scale: all three window shapes shuffle once on (window, key) into a hash
  * aggregate; session windows additionally sort within user partitions —
  * exactly the plan a 1000-executor streaming job would run.
  */
object StreamingOps {

  /** 1-hour tumbling windows × event_type. `window()` aligns to the epoch, so
    * the tumbling bucket equals `date_trunc('hour', ts)` — the oracle's form.
    */
  def streamTumbling(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("window.start")).as("ws"), col("event_type"), col("cnt"))
      .orderBy("ws", "event_type")

  /** 1-hour windows sliding every 15 minutes: each event lands in 4 windows.
    * No DuckDB oracle (no per-row window multiplication there) — scalatest
    * checks counts against a hand-built expansion.
    */
  def streamSliding(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("cnt"),
        (sum(Exact.cents(col("value"))) / 100.0).as("sum_value"))
      .select(unix_micros(col("window.start")).as("ws"), col("cnt"), col("sum_value"))
      .orderBy("ws")

  /** Per-user session windows, 30-minute gap. Spark's session gap is
    * INCLUSIVE: an event exactly `gap` after the previous one still merges
    * (windows [t, t+gap] merge on overlap, verified in StreamingSpec); a new
    * session starts only when the gap is strictly greater. Oracle reproduces
    * this with lag + cumulative sum using `> gap`.
    */
  def streamSession(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), unix_micros(col("session_window.start")).as("session_start"),
        col("n_events"))
      .orderBy("user_id", "session_start")
}
