package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Fixture-table access. Schemas come from Parquet footers — the reference
  * never declares schemas either (mkpipe_extractor_clickhouse/__init__.py:43,
  * `reader.load()` infers from the source).
  *
  * Timestamp normalization (session TZ is pinned UTC):
  *   - `events.ts` is TIMESTAMP(NANOS) parquet. Spark 4.1.2 reads it natively
  *     as a µs-truncated TIMESTAMP_NTZ (the same µs value DuckDB sees) and the
  *     NTZ branch below casts it to TimestampType; on readers where only the
  *     legacy nanos-as-long path exists (`legacy.parquet.nanosAsLong`, a no-op
  *     on 4.1.2) the LongType branch truncates ns→µs explicitly and
  *     [[graft.plans.PushdownNanosTimestamp]] restores scan pushdown. Both
  *     branches stay: which one is live depends on the reader's nanos
  *     handling, and the result is identical either way.
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

  // Every per-session memo map that keys on (dir, tag) registers here (by
  // reference identity) so `invalidate` can evict all derived tables of a
  // changed dir without each module exposing its own eviction hook.
  private val registry = new java.util.concurrent.CopyOnWriteArrayList[
    java.util.Map[SparkSession, _ <: java.util.Map[(String, String), _]]]()

  /** Per-session inner cache, shared with other per-session memoizers
    * (minhash/cluster/anchor/k-means tables in [[graft.ops.LlmPipeline]]).
    *
    * IMMUTABILITY CONTRACT: entries are keyed by (session, dir, tag) and
    * NEVER invalidated by an underlying-data change. What an entry holds
    * differs by layer, and that is exactly the hazard on a mutable dir:
    *
    *   - a memoized RAW READ is a plan, not data — whether execution
    *     re-lists the dir (appends show through) or serves Spark's own
    *     file-status cache (appends invisible) is NONDETERMINISTIC under
    *     mutation (measured both ways across runs);
    *   - DRIVER-SIDE results (k-means centroid matrices) and
    *     localCheckpoint'ed tables (cluster labels) are frozen at first
    *     use, permanently stale against a mutated dir;
    *   - `persist`ed derived tables (token/anchor tables) sit in between:
    *     the block cache may serve frozen partitions or silently
    *     recompute through a re-listing scan — also nondeterministic.
    *
    * A dir mutated in place therefore serves an INCOHERENT composite
    * view. That never happens in this engine's inputs-as-fixtures model
    * (extract rounds and the fixture dirs are immutable within a session;
    * the indexed streaming sinks read their sidecar state through
    * un-memoized per-batch plans) — but the day a mutable dir IS the
    * input, the caller must call [[invalidate]](spark, dir) after each
    * change (or use a fresh session). Mtime-based keying was rejected: it
    * adds a filesystem listing per access and still cannot refresh an
    * already-checkpointed derived table.
    */
  private[graft] def sessionCache[V](
      outer: java.util.Map[SparkSession, java.util.concurrent.ConcurrentHashMap[(String, String), V]],
      spark: SparkSession): java.util.concurrent.ConcurrentHashMap[(String, String), V] = {
    registry.synchronized {
      var seen = false
      val it = registry.iterator()
      while (it.hasNext && !seen) seen = it.next() eq outer
      if (!seen) registry.add(outer)
    }
    outer.synchronized {
      var m = outer.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, String), V]
        outer.put(spark, m)
      }
      m
    }
  }

  /** Evict every memoized plan and derived table bound to `dir` for this
    * session, across ALL modules' memo caches — the escape hatch the
    * immutability contract on [[sessionCache]] names: call after changing
    * a dir's contents in place, and the next access re-reads and
    * re-derives. Eviction is by dir, not by (dir, tag): derived tables
    * compose (cluster labels read signatures read the raw table), so a
    * partial eviction could rebuild one layer on a stale lower layer.
    */
  def invalidate(spark: SparkSession, dir: String): Unit = {
    registry.synchronized {
      registry.forEach { outer =>
        val m = outer.get(spark)
        if (m != null) {
          val it = m.keySet().iterator()
          while (it.hasNext) if (it.next()._1 == dir) it.remove()
        }
      }
    }
    // Also drop Spark's own file-status/plan caches under the path —
    // without this the freshly built plan can still serve the stale
    // listing, and WITH it the post-invalidate view is deterministic.
    spark.catalog.refreshByPath(dir)
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
