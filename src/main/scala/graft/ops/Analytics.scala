package graft.ops

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Behavioral / curation analytics beyond the reference's delegated-SQL
  * surface: deterministic stratified sampling, gap-based sessionization,
  * ordered-step funnels, and corpus-duplication reporting — the queries a
  * training-data curation pipeline runs between extraction and dedup.
  *
  * All four are DuckDB-oracle-checkable: randomness is a fixed LCG over the
  * key column (bit-identical in any engine), time arithmetic is exact int64
  * microseconds (`unix_micros` ≡ `epoch_us`), and every float is derived
  * from exact integer counts.
  */
object Analytics {

  /** Deterministic stratified sample: a fixed-size (k=20) per-language
    * sample drawn by ranking an LCG permutation of `doc_id` — the
    * reproducible equivalent of `TABLESAMPLE` per stratum. The LCG constants
    * are glibc's (public domain folklore); the modulus 2^31-1 keeps the key
    * positive in plain BIGINT arithmetic, so the oracle reproduces it
    * verbatim.
    *
    * Scale: `row_number <= k` over (lang) compiles to WindowGroupLimit —
    * per-partition top-k heaps push through the shuffle, so each executor
    * forwards at most k rows per stratum instead of sorting whole strata; at
    * 100 TB the shuffle carries O(strata × k), not O(rows).
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val skey = (col("doc_id") * lit(1103515245L) + lit(12345L)) % lit(2147483647L)
    val w = Window.partitionBy("lang").orderBy("skey", "doc_id")
    t(spark, dir, "documents")
      .select(col("lang"), col("doc_id"), skey.as("skey"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20)
      .select("lang", "doc_id", "skey")
      .orderBy("lang", "doc_id")
  }

  /** Session gap: two events of one user more than 30 minutes apart start a
    * new session (the classic web-analytics sessionization constant).
    */
  val SessionGapUs: Long = 30L * 60 * 1000000

  /** Gap-based sessionization of the event stream: per user, a session
    * starts at the first event or after a >30-min silence; sessions then
    * roll up to (n_events, start, end, duration). The batch counterpart of
    * the streaming `session_window` operator ([[StreamingOps.streamSession]])
    * — same semantics, replayable over the lake.
    *
    * Scale: `lag` and the running `sum` share one (user_id) hash partition +
    * (tus, event_id) sort — Catalyst plans both Window operators over a
    * single shuffle-sort, and the rollup groups on (user_id, sess_seq)
    * within the same user partition. One shuffle end-to-end; time math is
    * exact int64 micros.
    */
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy("user_id").orderBy("tus", "event_id")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("prev", lag(col("tus"), 1).over(wOrd))
      .withColumn("new_sess",
        when(col("prev").isNull || col("tus") - col("prev") > lit(SessionGapUs), 1L)
          .otherwise(0L))
      .withColumn("sess_seq", sum(col("new_sess")).over(wRun))
      .groupBy("user_id", "sess_seq")
      .agg(count(lit(1)).as("n_events"),
        min(col("tus")).as("start_us"),
        max(col("tus")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
      .orderBy("user_id", "sess_seq")
  }

  /** Ordered-step funnel view → click → purchase: per user, the first view,
    * the first click STRICTLY AFTER that view, and the first purchase
    * strictly after that click; `stage` counts the steps reached. The
    * strict-ordering semantics (each step must follow the previous step's
    * timestamp) are what separates a funnel from three independent filters.
    *
    * Scale: each step is a per-user min-aggregate BEFORE its join — the
    * joins touch one row per user per step, never raw events, so the fact
    * table is scanned once per step filter and reduced immediately.
    */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("tus")).as("first_view_us"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("tus") > col("first_view_us"))
      .groupBy("user_id").agg(min(col("tus")).as("first_click_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("tus") > col("first_click_us"))
      .groupBy("user_id").agg(min(col("tus")).as("first_purchase_us"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .withColumn("stage",
        (lit(1L) + when(col("first_click_us").isNotNull, 1L).otherwise(0L)
          + when(col("first_purchase_us").isNotNull, 1L).otherwise(0L)))
      .select("user_id", "first_view_us", "first_click_us", "first_purchase_us", "stage")
      .orderBy("user_id")
  }

  /** Per-source duplication report over a NORMALIZED content key: the
    * sorted set of distinct words — shuffled or repeated-word copies
    * collapse to one key (the cheap normalized-fingerprint tier between
    * exact sha2 dedup and MinHash; on this fixture ~11% of docs share a
    * word-set with another doc, where exact hashing finds zero). Reports,
    * per source, how many docs collide corpus-wide — the "which crawl seeds
    * are redundant" question a curation pipeline asks before spending the
    * near-dedup budget.
    *
    * Scale: the per-key copy count is a count-over-window on the key — ONE
    * hash shuffle of (source, key) pairs, no self-join; the key is a
    * bounded-size string (vocabulary is finite), and payload text never
    * shuffles. The final per-source rollup is a partial+final aggregate.
    */
  def curationDupRate(spark: SparkSession, dir: String): DataFrame = {
    val key = array_join(array_sort(array_distinct(split(col("text"), " "))), " ")
    val wKey = Window.partitionBy("k")
    t(spark, dir, "documents")
      .select(col("source"), key.as("k"))
      .withColumn("copies", count(lit(1)).over(wKey))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("copies") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        countDistinct(col("k")).as("n_distinct_keys"))
      .withColumn("dup_rate", col("n_dup_docs").cast("double") / col("n_docs"))
      .orderBy("source")
  }
}
