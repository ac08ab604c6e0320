package graft.extract

import graft.model._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The extraction engine — a Spark-first reimplementation of the reference's
  * `ClickhouseExtractor.extract` decision tree
  * (mkpipe_extractor_clickhouse/__init__.py:56-134) over Parquet-backed tables.
  *
  * Differences from the reference, by design:
  *   - The pushed SQL runs on Catalyst over temp views instead of being shipped
  *     to ClickHouse (__init__.py:40,101): the engine IS the analytic engine.
  *   - The batch is persisted (MEMORY_AND_DISK) before the existence probe,
  *     watermark max, and downstream write — the reference executes the pushed
  *     query up to 3× with no cache (__init__.py:103,112,132-134).
  *   - Non-custom-query extraction uses native Column predicates (filter pushed
  *     to the Parquet scan) rather than SQL text; the SQL renderer is kept for
  *     `custom_query` template parity and is property-tested equivalent.
  *
  * Scale notes (100 TB): the watermark max is a partial+final aggregate (no
  * data movement beyond one row per partition); the existence probe is a
  * CollectLimit(1) that short-circuits; `partitionsCount` maps to stride
  * partitioning on a JDBC source and to `repartitionByRange` here
  * (README.md:85-93); caching is bounded by executor storage with disk spill.
  */
final class Extractor(
    sfDir: String,
    cacheBatches: Boolean = true,
    /** Source strategy: how a table name becomes a DataFrame. Defaults to
      * the Parquet fixtures; a JDBC-backed variant passes
      * `(s, n) => JdbcSource.load(s, conn, TableConfig(n))` and the whole
      * decision tree — watermark, bounds, tri-state, template splice — runs
      * against the live source, with Catalyst pushing the incremental
      * predicates INTO the source query (the reference builds that WHERE
      * clause by hand, __init__.py:73-99; here it falls out of filter
      * pushdown). Proven end-to-end over embedded Derby in JdbcSourceSpec.
      */
    source: Option[(SparkSession, String) => DataFrame] = None) {

  /** Structured start/end logging (reference A18, __init__.py:59-65,125-131):
    * key=value pairs with table, replication method, mode, status.
    */
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[Extractor])

  private def logExtract(table: TableConfig, status: String, mode: String): Unit =
    log.info("extract table={} replication_method={} write_mode={} status={}",
      table.name, table.replicationMethod.toString.toLowerCase, mode, status)

  def readTable(spark: SparkSession, name: String): DataFrame =
    source.fold(graft.Tables.t(spark, sfDir, name))(f => f(spark, name))

  /** Range-partitioned parallel read (reference A15, README.md:85-93): on a
    * JDBC source this is stride partitioning (`partitionColumn`/`lowerBound`/
    * `upperBound`/`numPartitions`); on Parquet we expose the same parallelism
    * contract as a range repartition on the partitions column. Full
    * replication does not apply partitioning (README.md:93).
    */
  def readPartitioned(spark: SparkSession, t: TableConfig): DataFrame = {
    val df = readTable(spark, t.name)
    t.effectivePartitionsColumn match {
      case Some(c) if t.partitionsCount > 1 =>
        df.repartitionByRange(t.partitionsCount, col(c))
      case _ => df
    }
  }

  /** The extract decision tree (reference __init__.py:56-134). */
  def extract(
      spark: SparkSession,
      table: TableConfig,
      lastPoint: Option[String] = None,
      sqlDir: String = "./sql"): ExtractResult = {
    val customQuery = QueryTemplate.resolve(table, sqlDir)
    logExtract(table, "started", "-")
    table.replicationMethod match {
      case ReplicationMethod.Incremental if table.iterateColumn.isDefined =>
        val r = extractIncremental(spark, table, lastPoint, customQuery)
        logExtract(table, "completed", r.writeMode.toString.toLowerCase)
        r
      case _ =>
        // Full refresh (reference __init__.py:116-123): no predicate stage,
        // overwrite mode, no watermark; custom query spliced with WHERE 1=1.
        val df = customQuery match {
          case Some(q) =>
            readTable(spark, table.name).createOrReplaceTempView(table.name)
            // custom_query is CLICKHOUSE SQL by the reference's contract
            // (it ships to ClickHouse verbatim, __init__.py:96-101), so it
            // runs through the dialect layer: LIMIT BY / QUALIFY /
            // PREWHERE / quantile(p)(x) / uniqExact and friends in a
            // user's existing YAML work unchanged.
            graft.plans.ClickHouseSql.sql(spark,
              QueryTemplate.splice(q, Predicates.Tautology))
          case None => readTable(spark, table.name)
        }
        logExtract(table, "completed", "overwrite")
        ExtractResult(Some(df), SaveMode.Overwrite, None)
    }
  }

  private def extractIncremental(
      spark: SparkSession,
      table: TableConfig,
      lastPoint: Option[String],
      customQuery: Option[String]): ExtractResult = {
    val iterCol = table.iterateColumn.get
    val df0 = customQuery match {
      case Some(q) =>
        // Template path: SQL-clause parity with the reference (__init__.py:96-97),
        // executed by Catalyst over a temp view instead of by ClickHouse —
        // through the DIALECT layer, since custom_query is ClickHouse SQL
        // by the reference's contract (see the full-refresh branch).
        val (clause, _) = Predicates.incrementalClause(table, lastPoint)
        readTable(spark, table.name).createOrReplaceTempView(table.name)
        graft.plans.ClickHouseSql.sql(spark, QueryTemplate.splice(q, clause))
      case None =>
        // Native path: typed Column predicate, pushed down to the Parquet scan.
        val (pred, _) = Predicates.incrementalPredicate(table, lastPoint)
        readTable(spark, table.name).filter(pred)
    }
    val (_, mode) = Predicates.incrementalClause(table, lastPoint)
    val df = if (cacheBatches) df0.persist(StorageLevel.MEMORY_AND_DISK) else df0

    // Existence probe (reference A10, __init__.py:103): CollectLimit(1).
    if (df.take(1).isEmpty) {
      // Empty-batch tri-state (reference __init__.py:103-108): overwrite keeps
      // the empty df so the loader truncates; append returns None (no-op).
      if (cacheBatches) df.unpersist()
      mode match {
        case SaveMode.Overwrite => ExtractResult(Some(df0), SaveMode.Overwrite, None)
        case _                  => ExtractResult(None, SaveMode.Append, None)
      }
    } else {
      // Watermark (reference A11, __init__.py:110-115): global max over the
      // extracted batch, stringified. Partial+final HashAggregate — scales.
      val maxVal = df.agg(max(col(iterCol)).alias("max_val")).head().get(0)
      ExtractResult(Some(df), mode, Option(maxVal).map(stringify))
    }
  }

  /** Watermark string round-trip (reference `str(max_val)`, __init__.py:114).
    * Timestamps are rendered explicitly in UTC: `Timestamp.toString` uses the
    * JVM default timezone (spark.sql.session.timeZone does NOT affect it), so
    * on a non-UTC host the naive rendering would shift the persisted watermark
    * by the zone offset — silently skipping or re-extracting hours of rows on
    * re-splice (the re-parse path, [[Predicates.typedLit]] / SQL splice, is
    * interpreted in the UTC session zone). We convert the instant to a UTC
    * LocalDateTime and render it through `Timestamp.valueOf(...).toString`,
    * which formats the wall-clock fields directly — same
    * `yyyy-MM-dd HH:mm:ss.f…` shape as Python's str(datetime), preserved to
    * nanosecond precision, on every host.
    */
  private def stringify(v: Any): String = v match {
    case ts: java.sql.Timestamp => renderUtc(ts.toInstant)
    case i: java.time.Instant   => renderUtc(i) // java8API-enabled sessions
    case other => other.toString
  }

  /** Render the instant's UTC wall clock directly via java.time — never
    * through java.sql.Timestamp.valueOf, whose field-based constructor
    * resolves the fields in the JVM default zone: a UTC wall clock landing in
    * the default zone's DST spring-forward gap would be leniently shifted by
    * an hour, silently skipping that hour of rows on the next incremental
    * run. Shape: `yyyy-MM-dd HH:mm:ss[.fraction]` (seconds always printed,
    * fraction trimmed of trailing zeros and omitted when zero) — the same
    * shape as Timestamp.toString / Python's str(datetime), parseable by the
    * splice/typedLit re-parse.
    */
  private def renderUtc(i: java.time.Instant): String = Extractor.renderUtc(i)

  // (companion holds the shared formatter — see Extractor.WatermarkBaseFmt)

  /** Loader-side write, completing the reference's ExtractResult contract:
    * sink-mode selection (A14) + write-partition coalesce (A16, README.md:114).
    */
  def load(result: ExtractResult, table: TableConfig, outPath: String): Unit =
    result.df.foreach { df =>
      val out = table.writePartitions.fold(df)(n => df.coalesce(n))
      out.write.mode(result.writeMode).parquet(s"$outPath/${table.effectiveTargetName}")
    }
}

object Extractor {
  /** Always-seconds base of the watermark rendering (fraction appended
    * separately, trimmed); DateTimeFormatter is immutable and thread-safe.
    */
  private val WatermarkBaseFmt =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** UTC wall-clock rendering shared by the instance path and the
    * timezone-round-trip property test (scaladoc on the instance method).
    */
  private[graft] def renderUtc(i: java.time.Instant): String = {
    val ldt = i.atOffset(java.time.ZoneOffset.UTC).toLocalDateTime
    val base = ldt.format(WatermarkBaseFmt)
    if (ldt.getNano == 0) base
    else {
      var f = f"${ldt.getNano}%09d"
      while (f.endsWith("0")) f = f.dropRight(1)
      s"$base.$f"
    }
  }
}
