package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Fixture-table access. Schemas come from Parquet footers — the reference
  * never declares schemas either (mkpipe_extractor_clickhouse/__init__.py:43,
  * `reader.load()` infers from the source).
  *
  * Timestamp normalization (session TZ is pinned UTC):
  *   - `events.ts` is TIMESTAMP(NANOS) parquet, which Spark 4 refuses to read
  *     natively; we read it as a nanos long (`legacy.parquet.nanosAsLong`) and
  *     truncate to a µs TimestampType — the same µs value DuckDB sees.
  *   - ms-precision columns load as TIMESTAMP_NTZ (isAdjustedToUTC=false);
  *     cast to TimestampType so instant functions (unix_micros, window) work.
  *     Under a UTC session both renderings are identical.
  */
object Tables {
  val All = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // DataFrames are immutable plans — cache per (session, dir, table) so
  // repeated reads skip file listing + footer schema inference (a fixed
  // ~100ms planning tax per read otherwise). The outer map holds the session
  // itself with reference-identity semantics (SparkSession doesn't override
  // equals), so a lookup can never serve plans bound to a different session —
  // the failure mode of the previous identityHashCode key, where a recycled
  // hash could collide. Note the cached DataFrames strongly reference their
  // session, so WeakHashMap entries in practice live until JVM exit; the
  // retention is bounded by sessions-ever-created (typically 1) and a stale
  // entry is unreachable by construction, never wrong.
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]]())

  /** Per-session inner cache, shared with other per-session memoizers. */
  private[graft] def sessionCache[V](
      outer: java.util.Map[SparkSession, java.util.concurrent.ConcurrentHashMap[(String, String), V]],
      spark: SparkSession): java.util.concurrent.ConcurrentHashMap[(String, String), V] = {
    outer.synchronized {
      var m = outer.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String), V]
        outer.put(spark, m)
      }
      m
    }
  }

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Session-level setup must run on every call, not only on cache miss —
    // a fresh session hitting a warm (dir, name) key still needs them.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.plans.PushdownNanosTimestamp.install(spark)
    sessionCache(cache, spark).computeIfAbsent((dir, name), _ => {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      val cols: Array[Column] = df.schema.fields.map { f =>
        if (f.dataType == TimestampNTZType)
          col(f.name).cast("timestamp").as(f.name)
        else if (f.name == "ts" && f.dataType == LongType)
          timestamp_micros(expr("ts DIV 1000")).as("ts")
        else col(f.name)
      }
      df.select(cols.toSeq: _*)
    })
  }

  /** Register every fixture table as a temp view for spark.sql paths. */
  def registerViews(spark: SparkSession, dir: String, names: Seq[String] = All): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
