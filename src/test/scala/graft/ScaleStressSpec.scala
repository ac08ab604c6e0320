package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{LlmPipeline, Skew}

/** Scale-stress evidence ABOVE fixture scale: the invariants that decide
  * 100 TB viability are asserted at ≥10× the sf0.001 fixture, inflated at
  * RUNTIME by exploding a literal rep range over the real tables —
  * deterministic, no new fixtures. What is pinned is not wall-clock (noise
  * at this scale) but the quantities that grow with data if a plan is
  * wrong: per-reducer shuffle share under a hot key, candidate-pair counts
  * under a degenerate LSH bucket, and rows crossing the shuffle for a
  * top-k-per-key query.
  */
class ScaleStressSpec extends SparkSpec {

  /** ~10× runtime inflation of the events fixture (1,000 → 10,000 rows):
    * each source row replicated with a distinct rep so inflated keys stay
    * unique where the test needs them to.
    */
  private def events10x: DataFrame =
    Tables.t(spark, sf, "events")
      .withColumn("rep", explode(sequence(lit(0L), lit(9L))))

  /** Per-task shuffle-read record counts for every task the action runs
    * (same drain discipline as SkewSpec: the listener bus is async, so wait
    * for 3 consecutive quiet polls).
    */
  private def shuffleRecordsPerTask(action: => Unit): Seq[Long] = {
    val buf = mutable.Buffer[Long]()
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) {
          val r = e.taskMetrics.shuffleReadMetrics.recordsRead
          if (r > 0) buf.synchronized { buf += r }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      var last = -1
      var quiet = 0
      while (quiet < 3) {
        Thread.sleep(200)
        val n = buf.synchronized(buf.size)
        if (n == last) quiet += 1 else { quiet = 0; last = n }
      }
      buf.synchronized(buf.toSeq)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join holds its max-reducer-share bound on 10x-inflated events") {
    // Half the inflated rows share one hot key (5,000 of 10,000); the rest
    // stay unique. Plan fixed for measurement exactly as in SkewSpec: no
    // broadcast, no AQE skew-split (salting is what's under test), 16
    // reducers.
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "16") {
      val probe = events10x.select(
        when(col("event_id") % 2 === 0, lit(0L))
          .otherwise(col("event_id") * 10 + col("rep")).as("k"),
        (col("event_id") * 10 + col("rep")).as("rid"))
      val nRows = probe.count()
      val nHot = probe.filter(col("k") === 0L).count()
      assert(nRows == 10000L && nHot == 5000L, s"inflation drifted: $nRows/$nHot")
      val build = spark.range(100).select(col("id").as("bk"),
        concat(lit("d"), col("id")).as("attr"))

      val salted = shuffleRecordsPerTask {
        Skew.saltedJoin(probe, probe("k"), probe("rid"), build, col("bk"), salts = 16)
          .agg(count(lit(1))).collect()
      }
      // The hot key spans 16 salt cells over 16 reducers; birthday collisions
      // allow a reducer 2-3 cells, so the bound is nHot/3 — at ANY scale the
      // max share stays ~salts-fold below the unsalted single-owner plan.
      assert(salted.max <= nHot / 3,
        s"salted max ${salted.max} of $nHot hot rows still concentrated: " +
          s"${salted.sorted.reverse.take(5)}")
    }
  }

  test("LSH hot bucket at 5,000 members emits star-links, not quadratic pairs") {
    // All 5,000 inflated doc ids land in ONE (band, bucket): a correct
    // kernel emits b−1 star pairs; a quadratic one emits C(5000,2) ≈ 12.5M.
    val ids = Tables.t(spark, sf, "documents")
      .withColumn("rep", explode(sequence(lit(0L), lit(9L))))
      .select((col("doc_id") * 10 + col("rep")).as("doc_id")) // 0..4999, unique
    val hot = ids.select(col("doc_id"), lit(0).as("band"), lit(42L).as("bucket"))
    val hotPairs = LlmPipeline.bucketedPairs(hot)
    assert(hotPairs.count() == 4999L,
      "hot bucket must star-link to its min member: b-1 pairs exactly")
    val centers = hotPairs.select(countDistinct(col("doc_a"))).head().getLong(0)
    assert(centers == 1L, s"star pairs must share one center, got $centers")
    assert(hotPairs.filter(col("doc_b") <= col("doc_a")).count() == 0L)

    // Under the same kernel, 1,000 small buckets of 5 members each stay on
    // the exact all-pairs path: 1,000 × C(5,2) = 10,000 pairs, i<j ordered.
    val small = ids.select(col("doc_id"), lit(1).as("band"),
      (col("doc_id") % 1000).as("bucket"))
    val smallPairs = LlmPipeline.bucketedPairs(small)
    assert(smallPairs.count() == 10000L,
      "small buckets must emit exact i<j pairs: 1000 buckets x C(5,2)")
    assert(smallPairs.filter(col("doc_b") <= col("doc_a")).count() == 0L)
  }

  test("top-k per key at 10x scale: WindowGroupLimit bounds rows crossing the shuffle") {
    withConfs("spark.sql.shuffle.partitions" -> "16") {
      val df = events10x.select(col("user_id"),
        (col("value") + col("rep")).as("v"),
        (col("event_id") * 10 + col("rep")).as("rid"))
      val total = df.count() // 10,000
      val w = Window.partitionBy("user_id").orderBy(col("v").desc, col("rid"))
      def topk = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)

      val plan = topk.queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"top-k per key must plan a WindowGroupLimit pre-filter:\n$plan")
      val withLimit = shuffleRecordsPerTask { topk.collect() }

      // Differential control: the same query with the rewrite disabled ships
      // EVERY row through the partition-by shuffle.
      var withoutRecs: Seq[Long] = Nil
      withConfs("spark.sql.optimizer.windowGroupLimitThreshold" -> "-1") {
        withoutRecs = shuffleRecordsPerTask { topk.collect() }
      }
      assert(withoutRecs.sum >= total,
        s"control run should shuffle all $total rows, saw ${withoutRecs.sum}")
      // With the rewrite: each map task pre-trims to ≤3 rows per key it
      // holds, so crossing rows scale with keys × maps, never with data.
      assert(withLimit.sum <= total / 4,
        s"WindowGroupLimit failed to bound the shuffle: ${withLimit.sum} of $total")
    }
  }

  test("native as-of join equals the composed window form at 10x per-user density") {
    // ScaleBench measures the ×scale² wall-clock divergence; this pins the
    // SEMANTICS at inflated scale: every (purchase, matched click) pair
    // identical between the one-buffered-row merge and the candidate+argmax
    // form, including rep-shifted ties and unmatched purchases.
    val ev = events10x
      .select((col("event_id") * 10 + col("rep")).as("event_id"),
        col("user_id"), col("event_type"),
        (unix_micros(col("ts")) + col("rep")).as("tus"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"), col("tus").as("pus"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"), col("tus").as("cus"))
    val native = org.apache.spark.sql.graft.AsOf.asofJoin(p, c,
        Seq("user_id"), Seq("cu"), "pus", "cus", Seq("cid"))
      .select("pid", "cid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1).toSeq
    val w = Window.partitionBy("pid").orderBy(col("cus").desc, col("cid").desc)
    val m = p.join(c, col("user_id") === col("cu") && col("cus") <= col("pus"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("pid", "cid")
    val composed = p.join(m, Seq("pid"), "left")
      .select("pid", "cid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(native.length == composed.length && native.nonEmpty)
    assert(native == composed, "as-of regimes diverged at 10x density")
    assert(native.exists(_._2 == -1L) && native.exists(_._2 >= 0),
      "inflated fixture must exercise both matched and unmatched purchases")
  }

  test("edit-distance join at 4x disjoint-vocabulary copies: per-copy pairs identical, zero cross-copy") {
    // Every word gains a per-rep tag, so (a) within a copy all pair
    // distances transform identically — the four copies must emit the SAME
    // pair set (modulo the id offset) — and (b) cross-copy texts differ in
    // every word, so any candidate leak across copies would surface as an
    // impossible pair. Pins linearity-by-structure for the rarest-first
    // prefix filter: true work is exactly 4x one copy.
    val dir = java.nio.file.Files.createTempDirectory("graft-edj4x").toString
    val base = Tables.t(spark, sf, "documents").select(col("doc_id"), col("text"))
    base.withColumn("rep", explode(sequence(lit(0L), lit(3L))))
      .select((col("doc_id") + col("rep") * 1000000L).as("doc_id"),
        expr("concat_ws(' ', transform(split(text, ' '), " +
          "w -> concat('r', cast(rep as string), w)))").as("text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.LlmPipeline.dedupEditDistance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty, "the inflated corpus must keep its near pairs")
    assert(got.forall(t => t._1 / 1000000L == t._2 / 1000000L),
      s"cross-copy pair leaked: ${got.filter(t => t._1 / 1000000L != t._2 / 1000000L).take(3).toSeq}")
    val byRep = got.groupBy(_._1 / 1000000L).map { case (rep, ts) =>
      rep -> ts.map(t => (t._1 - rep * 1000000L, t._2 - rep * 1000000L, t._3)).toSet
    }
    assert(byRep.keySet == Set(0L, 1L, 2L, 3L), s"copies missing: ${byRep.keySet}")
    assert(byRep.values.toSet.size == 1,
      "all four copies must emit the identical rebased pair set")
    assert(got.length == 4 * byRep(0L).size, "pairs must grow exactly x4")
  }

  test("novelty kernel at 4x disjoint corpus copies: per-copy scores identical to the base run") {
    // Linearity-by-structure for the first-seer min kernel: 4 corpus copies
    // with disjoint vocabularies (terms tagged per rep, doc_ids offset) must
    // reproduce the base corpus's novelty profile EXACTLY inside every copy
    // — any cross-copy candidate leak or min contamination breaks equality,
    // and true-work growth is exactly ×scale (no quadratic candidate term).
    val base = LlmPipeline.ppjDocs(spark, sf)
      .select(col("doc_id"), explode(col("toks")).as("term"))
    val expected = LlmPipeline.noveltyOf(base).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val inflated = base
      .withColumn("rep", explode(sequence(lit(0L), lit(3L))))
      .select((col("doc_id") + col("rep") * 1000000L).as("doc_id"),
        concat(col("rep").cast("string"), lit("#"), col("term")).as("term"))
    val got = LlmPipeline.noveltyOf(inflated).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 4 * expected.size, s"rows must grow exactly x4: ${got.length}")
    for (rep <- 0L to 3L) {
      val slice = got.filter(t => t._1 / 1000000L == rep)
        .map(t => (t._1 - rep * 1000000L, t._2, t._3, t._4)).toSet
      assert(slice == expected, s"copy $rep diverged from the base novelty profile")
    }
  }

  test("strict funnel and timed sequenceMatch are density-invariant at 32x per-user event inflation") {
    // The strict-funnel/sequence folds buffer one group's matching
    // events (the groupArray cost class); the hot-user hazard is that
    // buffer growing with density. Replicate every event ×32 into
    // disjoint ~100-day time blocks for the SAME user: each per-user
    // array grows ×32 while the exact answer provably cannot change (no
    // 6 h window or strict chain spans blocks). SCALEBENCH's
    // funnel_strict_dense/seq_match_dense legs measure the ×16/×64 cost
    // curve; this pins the exactness half deterministically in-suite.
    val blockS = 100L * 86400L
    def ev(scale: Long): DataFrame = Tables.t(spark, sf, "events")
      .withColumn("rep", explode(sequence(lit(0L), lit(scale - 1))))
      .select(col("user_id").as("u"),
        ((unix_micros(col("ts")) / lit(1000000L)).cast("long") +
          col("rep") * lit(blockS)).as("ts_s"),
        col("event_type"))
    def strictHist(df: DataFrame): Map[Int, Long] = {
      df.createOrReplaceTempView("ss_dense")
      graft.plans.ClickHouseSql.sql(spark,
        """SELECT windowFunnel(21600, 'strict_increase')(ts_s,
          |  event_type = 'view', event_type = 'click', event_type = 'purchase') AS lvl
          |FROM ss_dense GROUP BY u""".stripMargin)
        .groupBy("lvl").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    def seqUsers(df: DataFrame): Long = {
      df.createOrReplaceTempView("ss_dense")
      graft.plans.ClickHouseSql.sql(spark,
        """SELECT u FROM ss_dense GROUP BY u
          |HAVING sequenceMatch('(?1).*(?t<=21600)(?2)')(ts_s,
          |  event_type = 'view', event_type = 'purchase')""".stripMargin).count()
    }
    val baseHist = strictHist(ev(1L))
    val baseSeq = seqUsers(ev(1L))
    assert(baseHist.nonEmpty && baseSeq > 0, (baseHist, baseSeq))
    assert(strictHist(ev(32L)) == baseHist,
      "strict-funnel histogram must be density-invariant at x32")
    assert(seqUsers(ev(32L)) == baseSeq,
      "timed sequenceMatch user count must be density-invariant at x32")
  }
}
