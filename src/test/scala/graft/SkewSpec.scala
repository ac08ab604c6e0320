package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.ops.Skew

/** Adversarial-skew evidence for the salted operators: row-identity with the
  * unsalted plans is already driver-proven (join_salted / agg_salted_user
  * oracles); these tests prove the POINT of salting — on a deliberately hot
  * key, the unsalted shuffle concentrates on one reducer and the salted
  * shuffle does not — via task metrics and partition distributions, not
  * wall-clock (timing at this scale is codegen-floor noise).
  */
class SkewSpec extends SparkSpec {

  /** Hot-key fixture: nHot rows share key 0, the rest are unique. */
  private val nRows = 40000L
  private val nHot = 30000L
  private def hotProbe = spark.range(nRows).select(
    when(col("id") < nHot, lit(0L)).otherwise(col("id")).as("k"),
    col("id").as("rid"))

  /** Per-task shuffle-read record counts for every task the action runs.
    * The listener bus is async: drain by waiting until the buffer stops
    * growing (3 consecutive 200 ms quiet polls).
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

  test("salted join: hot probe key's shuffle records spread across tasks (max-share bound)") {
    // Fix the plan for measurement: no broadcast (the hot side must actually
    // shuffle), no AQE rewrites (its skew-split is the runtime alternative
    // to salting — here we isolate the salting effect), 16 reducers.
    withConfs(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "16") {
      val build = spark.range(100).select(col("id").as("bk"),
        concat(lit("d"), col("id")).as("attr"))

      val unsalted = shuffleRecordsPerTask {
        hotProbe.join(build, col("k") === col("bk"))
          .agg(count(lit(1))).collect()
      }
      val salted = shuffleRecordsPerTask {
        val p = hotProbe
        Skew.saltedJoin(p, p("k"), p("rid"), build, col("bk"), salts = 16)
          .agg(count(lit(1))).collect()
      }

      // Unsalted SMJ: one reducer fetches every hot-key probe row.
      assert(unsalted.max >= (nHot * 0.9).toLong,
        s"expected a hot reducer ≥ ${(nHot * 0.9).toLong}, tasks: ${unsalted.sorted.reverse.take(5)}")
      // Salted (k, salt) join: the hot key spans 16 salts over 16 reducers.
      // Bound is nHot/3, not nHot/16: salt cells collide on reducers
      // (birthday), so a reducer can own 2-3 cells — still a >3× spread vs
      // the unsalted single owner, and the max/mean assert below pins the
      // comparative claim.
      assert(salted.max <= nHot / 3,
        s"salted max ${salted.max} still concentrated, tasks: ${salted.sorted.reverse.take(5)}")
      val meanS = salted.sum.toDouble / salted.length
      assert(salted.max / meanS < unsalted.max / (unsalted.sum.toDouble / unsalted.length),
        s"salted max/mean ${salted.max / meanS} not better than unsalted")
    }
  }

  test("salt key spreads the hot aggregation key across reduce partitions") {
    // The two-phase agg's phase-1 shuffle key is (user_id, salt); its whole
    // benefit is the partition histogram below — the holistic agg's raw rows
    // land 1/salts per cell instead of all-on-one-reducer. (Algebraic
    // count/sum partials already collapse map-side; the salted form is for
    // holistic/overflow cases — see Skew scaladoc.)
    val df = hotProbe.withColumn("salt", pmod(hash(col("rid")), lit(8)))
    def maxPartitionRows(parts: Int, keys: Column*): Long =
      df.repartition(parts, keys: _*)
        .groupBy(spark_partition_id().as("p")).count()
        .agg(max("count")).head().getLong(0)

    val unsaltedMax = maxPartitionRows(16, col("k"))
    val saltedMax = maxPartitionRows(16, col("k"), col("salt"))
    assert(unsaltedMax >= nHot, s"hot key must own one partition: $unsaltedMax")
    assert(saltedMax <= nHot / 3,
      s"salted cells must spread the hot key: $saltedMax (expect ≈ ${nHot / 8})")
    assert(saltedMax < unsaltedMax / 3)
  }
}
