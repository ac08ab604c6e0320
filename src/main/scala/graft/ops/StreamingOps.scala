package graft.ops

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** Constants for [[streamWatermarkLate]]: watermark delay (10 min),
    * simulated ingest jitter bound (30 min), and the processing-time
    * trigger interval (1 min). Jitter > delay is what makes late data
    * exist at all — a perfectly ordered replay (the fixture's event_id
    * order IS sorted by event time) never drops anything. */
  val LateDelayUs: Long = 10L * 60 * 1000000
  val LateJitterUs: Long = 30L * 60 * 1000000
  val LateTriggerUs: Long = 60L * 1000000

  /** Watermark late-drop accounting — the batch-equivalent reconstruction
    * of Structured Streaming's event-time watermark under out-of-order
    * ingest. Each event ARRIVES at event time + a deterministic LCG jitter
    * (0–30 min; the repo's standard reproducible-randomness trick, same
    * constants as [[Analytics.sampleStratified]]) — a network-delayed
    * source replay. Micro-batches are 1-minute processing-time triggers
    * over arrival time, and the watermark USED in batch b is max(event
    * time seen through batch b−1) − 10 min — exactly Spark's semantics,
    * where the watermark only advances between micro-batches. An event is
    * LATE (a streaming agg would drop it) when its event time is below
    * that watermark. Output: per event-hour, arrivals vs late drops vs
    * kept — the lag/loss dashboard every streaming ingest runs.
    * `StreamingSpec` replays the same jittered arrival order through a
    * real MemoryStream + `withWatermark` to pin that "late" here means
    * dropped there.
    *
    * Scale: the sequential dependency lives ONLY on the O(n_batches)
    * per-batch max table (a groupBy away from the events), where the
    * running max is a window over batch id — thousands of rows for days
    * of stream, one light task; events join that tiny table BROADCAST and
    * aggregate map-side. Nothing row-scale is sequential, matching the
    * real engine (per-partition maxes → global min at the batch boundary).
    */
  def streamWatermarkLate(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("jit",
        (col("event_id") * lit(1103515245L) + lit(12345L)) % lit(2147483647L)
          % lit(LateJitterUs))
      .withColumn("batch",
        floor((col("tus") + col("jit")) / lit(LateTriggerUs)).cast("long"))
    val batchMax = ev.groupBy("batch").agg(max(col("tus")).as("bmax"))
    val wmw = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, -1)
    val wm = batchMax
      .withColumn("wm", max(col("bmax")).over(wmw) - lit(LateDelayUs))
      .select(col("batch"), col("wm"))
    ev.join(broadcast(wm), "batch")
      .withColumn("late",
        when(col("wm").isNotNull && col("tus") < col("wm"), 1L).otherwise(0L))
      .groupBy(floor(col("tus") / lit(3600L * 1000000)).cast("long").as("hour_num"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("late")).as("n_late"),
        sum(lit(1L) - col("late")).as("n_kept"))
      .orderBy("hour_num")
  }

  /** As-of enrichment in its STREAMING-STATE-MACHINE formulation, replayed
    * as SQL: union clicks and purchases into one per-user timeline and
    * carry the latest click forward with `last(..., ignoreNulls) OVER
    * (rows unbounded preceding)` — literally the
    * [[graft.streaming.StreamingExtract.AsofEnrichProcessor]] ValueState
    * update written as a window function. Ties order (time, kind, id) with
    * clicks first, so an at-the-same-instant click is visible (at-or-
    * before) and same-time clicks resolve to the max id — IDENTICAL
    * semantics (and oracle) to [[Relational.joinAsofNative]]'s sorted
    * merge; only the plan differs: one window over the unioned stream vs
    * two exchanges + merge. The window form wins when the timeline is
    * already materialized as one table; the merge operator wins when the
    * sides are separate and lookback is deep (no need to co-sort the
    * whole union).
    *
    * Scale: one user-keyed window shuffle over clicks+purchases.
    */
  def streamAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"),
        when(col("event_type") === "click", 0L).otherwise(1L).as("kind"))
    val w = Window.partitionBy("user_id").orderBy("tus", "kind", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("click_id",
        last(when(col("kind") === 0, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("click_us",
        last(when(col("kind") === 0, col("tus")), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("tus").as("purchase_us"), col("click_id"), col("click_us"))
      .orderBy("purchase_id")
  }
}
