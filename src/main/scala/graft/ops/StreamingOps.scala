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

  /** Attribution window for the stream-stream interval join: a purchase
    * attributes to a click at most this long before it. */
  val AttributionUs: Long = 30L * 60 * 1000000

  /** Click→purchase attribution: each purchase joins every click by the
    * same user in the preceding 30 minutes — the batch-equivalent of a
    * watermarked stream-stream interval join (`StreamingSpec` drives the
    * same join through two MemoryStreams with `withWatermark` on both
    * sides to pin the state-retention and late-drop semantics that only
    * exist in streaming).
    *
    * Scale: an equi join on user_id with the interval as a residual
    * range predicate — ONE hash shuffle of each side keyed on user, no
    * broadcast needed (both sides are streams/facts), no cartesian: the
    * range rides the hash join as a filter. In streaming, the watermark
    * bounds join state to 30 minutes of clicks per user — exactly the
    * interval bound, so state size is O(rate × window), not unbounded.
    * Time math is exact int64 micros on both engines.
    */
  def streamJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("click_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("purchase_us"))
    clicks.join(purchases,
        col("user_id") === col("p_user") &&
        col("purchase_us") >= col("click_us") &&
        col("purchase_us") <= col("click_us") + AttributionUs)
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (col("purchase_us") - col("click_us")).as("delta_us"))
      .orderBy("click_id", "purchase_id")
  }
}
