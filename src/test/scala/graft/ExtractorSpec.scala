package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.extract.{Extractor, Predicates, QueryTemplate}
import graft.model._

/** The reference's extract decision tree (mkpipe_extractor_clickhouse/
  * __init__.py:56-134), branch by branch, plus the observable edge semantics
  * SURVEY §5.2 calls out.
  */
class ExtractorSpec extends SparkSpec {

  private def ex = new Extractor(sf)

  private val incrTs = TableConfig("events",
    replicationMethod = ReplicationMethod.Incremental,
    iterateColumn = Some("ts"), iterateColumnType = IterateType.DatetimeCol)

  private val incrId = TableConfig("events",
    replicationMethod = ReplicationMethod.Incremental,
    iterateColumn = Some("event_id"), iterateColumnType = IterateType.IntCol)

  test("datetime watermark stringify is UTC regardless of JVM default timezone") {
    // Timestamp.toString renders in the JVM default zone; the fix renders the
    // instant explicitly in UTC so the persisted watermark re-splices to the
    // same instant on any host (the re-parse path uses the UTC session TZ).
    val prev = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("America/New_York"))
      val r = ex.extract(spark, incrTs, lastPoint = None)
      val wm = r.lastPoint.get
      val inst = java.time.LocalDateTime.parse(wm.replace(' ', 'T'))
        .toInstant(java.time.ZoneOffset.UTC)
      val parsedUs = inst.getEpochSecond * 1000000L + inst.getNano / 1000
      val wantUs = Tables.t(spark, sf, "events")
        .agg(unix_micros(max(col("ts")))).head().getLong(0)
      assert(parsedUs == wantUs,
        s"watermark '$wm' parsed as UTC gives $parsedUs µs, batch max is $wantUs µs")
      // Round-trip: re-splicing the watermark must re-extract the boundary row.
      val second = ex.extract(spark, incrTs, lastPoint = Some(wm))
      assert(second.df.isDefined && second.df.get.count() >= 1)
    } finally java.util.TimeZone.setDefault(prev)
  }

  test("watermark render survives the default zone's DST spring-forward gap") {
    // 2026-03-08 02:30 UTC is a nonexistent LOCAL time in America/New_York
    // (spring-forward gap). A field-based render via Timestamp.valueOf would
    // leniently shift it to 03:30, silently skipping an hour of rows on
    // re-splice; the java.time render must emit the UTC wall clock verbatim.
    val dir = java.nio.file.Files.createTempDirectory("graft-dst").toString
    import spark.implicits._
    Seq((1L, java.sql.Timestamp.from(java.time.Instant.parse("2026-03-08T02:30:00Z"))))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val prev = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("America/New_York"))
      val r = new Extractor(dir).extract(spark,
        TableConfig("events", replicationMethod = ReplicationMethod.Incremental,
          iterateColumn = Some("ts"), iterateColumnType = IterateType.DatetimeCol))
      assert(r.lastPoint.contains("2026-03-08 02:30:00"), s"got ${r.lastPoint}")
    } finally java.util.TimeZone.setDefault(prev)
  }

  test("full replication: overwrite, no watermark, all rows") {
    val r = ex.extract(spark, TableConfig("orders"))
    assert(r.writeMode == SaveMode.Overwrite)
    assert(r.lastPoint.isEmpty)
    assert(r.df.get.count() == 1500)
  }

  test("incremental without iterateColumn degrades to full (reference :71 guard)") {
    val r = ex.extract(spark,
      TableConfig("orders", replicationMethod = ReplicationMethod.Incremental))
    assert(r.writeMode == SaveMode.Overwrite)
    assert(r.df.get.count() == 1500)
  }

  test("incremental initial load: tautology filter, overwrite, watermark computed") {
    val r = ex.extract(spark, incrTs, lastPoint = None)
    assert(r.writeMode == SaveMode.Overwrite)
    assert(r.df.get.count() == 1000)
    // watermark = stringified max(ts) over the batch (reference :110-115)
    assert(r.lastPoint.isDefined)
    assert(r.lastPoint.get.startsWith("2024-01-"))
  }

  test("incremental with lastPoint: inclusive watermark — boundary row re-extracted") {
    val first = ex.extract(spark, incrId, lastPoint = None)
    val wm = first.lastPoint.get // "999" at sf0.001
    assert(wm == "999")
    // Re-extract with the persisted watermark: the boundary row itself comes
    // back (>= semantics, reference __init__.py:89) — at-least-once delivery.
    val second = ex.extract(spark, incrId, lastPoint = Some(wm))
    assert(second.writeMode == SaveMode.Append)
    val ids = second.df.get.select("event_id").collect().map(_.getLong(0))
    assert(ids.toSeq == Seq(999L))
  }

  test("static bounds: half-open [lower, upper), append mode") {
    val r = ex.extract(spark, incrId.copy(
      filterLowerBound = Some("10"), filterUpperBound = Some("20")))
    assert(r.writeMode == SaveMode.Append)
    val ids = r.df.get.select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.head == 10L && ids.last == 19L && ids.length == 10)
  }

  test("bounds win over lastPoint (reference :72 precedence)") {
    val r = ex.extract(spark,
      incrId.copy(filterLowerBound = Some("10"), filterUpperBound = Some("20")),
      lastPoint = Some("500"))
    assert(r.df.get.count() == 10)
  }

  test("empty batch + append mode: df=None no-op (reference :107-108)") {
    val r = ex.extract(spark, incrId.copy(filterLowerBound = Some("99999")))
    assert(r.df.isEmpty)
    assert(r.writeMode == SaveMode.Append)
    assert(r.lastPoint.isEmpty)
  }

  test("empty batch + overwrite (initial incremental on empty result): keeps empty df") {
    // Custom query that yields nothing, no lastPoint → overwrite branch.
    // (The {query_filter} hole must be the query's own WHERE slot — a
    // template with a second WHERE is invalid SQL in the reference too.)
    val r = ex.extract(spark, incrTs.copy(customQuery =
      Some("SELECT * FROM (SELECT * FROM events WHERE event_id < 0) AS t {query_filter}")))
    assert(r.writeMode == SaveMode.Overwrite)
    assert(r.df.isDefined && r.df.get.isEmpty)
  }

  test("watermark string round-trip is monotone across successive batches") {
    val b1 = ex.extract(spark, incrTs, lastPoint = None)
    val wm1 = b1.lastPoint.get
    val b2 = ex.extract(spark, incrTs, lastPoint = Some(wm1))
    val wm2 = b2.lastPoint.get
    assert(wm2 >= wm1) // string compare is consistent for the pinned rendering
    // And re-splicing the watermark yields exactly the boundary rows:
    assert(b2.df.get.count() >= 1)
  }

  test("datetime literal rendering quotes; int renders bare (reference :75-91)") {
    assert(Predicates.renderLiteral("42", IterateType.IntCol) == "42")
    assert(Predicates.renderLiteral("2024-01-01 00:00:00", IterateType.DatetimeCol)
      == "'2024-01-01 00:00:00'")
  }

  test("clause decision tree: bounds/watermark/tautology") {
    val (c1, m1) = Predicates.incrementalClause(
      incrId.copy(filterLowerBound = Some("1"), filterUpperBound = Some("5")), None)
    assert(c1 == "WHERE event_id >= 1 AND event_id < 5" && m1 == SaveMode.Append)
    val (c2, m2) = Predicates.incrementalClause(incrTs, Some("2024-01-15 00:00:00"))
    assert(c2 == "WHERE ts >= '2024-01-15 00:00:00'" && m2 == SaveMode.Append)
    val (c3, m3) = Predicates.incrementalClause(incrTs, None)
    assert(c3 == "WHERE 1=1" && m3 == SaveMode.Overwrite)
  }

  test("template splice replaces the hole verbatim (reference :96-97)") {
    assert(QueryTemplate.splice("SELECT * FROM t {query_filter} LIMIT 1", "WHERE a >= 2")
      == "SELECT * FROM t WHERE a >= 2 LIMIT 1")
  }

  test("custom query file variant reads ./sql/<file> (reference :48-53)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sql")
    java.nio.file.Files.writeString(dir.resolve("q.sql"),
      "SELECT event_id, ts FROM events {query_filter}")
    val r = ex.extract(spark,
      incrTs.copy(customQueryFile = Some("q.sql")),
      lastPoint = Some("2024-01-15 00:00:00"), sqlDir = dir.toString)
    assert(r.df.get.columns.toSeq == Seq("event_id", "ts"))
    assert(r.df.get.count() > 0)
  }

  test("load(): writes with selected mode + writePartitions coalesce (A14/A16)") {
    val out = java.nio.file.Files.createTempDirectory("graft-out").toString
    val r = ex.extract(spark, TableConfig("nation", writePartitions = Some(1)))
    ex.load(r, TableConfig("nation", writePartitions = Some(1)), out)
    val written = spark.read.parquet(s"$out/nation")
    assert(written.count() == 25)
    assert(new java.io.File(s"$out/nation").listFiles()
      .count(_.getName.endsWith(".parquet")) == 1)
  }

  test("readPartitioned produces partitionsCount slices with all rows (A15)") {
    val cfg = TableConfig("lineitem",
      replicationMethod = ReplicationMethod.Incremental,
      iterateColumn = Some("l_orderkey"), partitionsCount = 8)
    val df = ex.readPartitioned(spark, cfg)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == Tables.t(spark, sf, "lineitem").count())
    // Full replication: partitioning not applied (README.md:93 semantics —
    // partitionsCount defaults through but no iterate/partitions column set).
    assert(ex.readPartitioned(spark, TableConfig("nation")).rdd.getNumPartitions ==
      Tables.t(spark, sf, "nation").rdd.getNumPartitions)
  }

  test("Column predicate path equals SQL clause path") {
    val cfgs = Seq(
      incrId.copy(filterLowerBound = Some("100"), filterUpperBound = Some("300")),
      incrId.copy(filterLowerBound = Some("100")),
      incrTs)
    for (cfg <- cfgs; lp <- Seq(None, Some(if (cfg.iterateColumnType == IterateType.IntCol) "500" else "2024-01-15 00:00:00"))) {
      val (clause, _) = Predicates.incrementalClause(cfg, lp)
      val (pred, _) = Predicates.incrementalPredicate(cfg, lp)
      Tables.t(spark, sf, "events").createOrReplaceTempView("events")
      val viaSql = spark.sql(s"SELECT event_id FROM events $clause")
      val viaCol = Tables.t(spark, sf, "events").filter(pred).select("event_id")
      assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty,
        s"mismatch for clause '$clause'")
    }
  }
}
