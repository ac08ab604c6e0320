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
  // ~100ms planning tax per read otherwise).
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.computeIfAbsent((System.identityHashCode(spark), dir, name), _ => {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      graft.plans.PushdownNanosTimestamp.install(spark)
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

  /** Register every fixture table as a temp view for spark.sql paths. */
  def registerViews(spark: SparkSession, dir: String, names: Seq[String] = All): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
