package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc stage profiler for optimization rounds (guide §1): times a named
  * query end-to-end through the noop sink — the measurement the bench's
  * count() action approximates — and, for queries with a registered
  * stage decomposition, each internal stage in isolation so the expensive
  * one is identified by measurement instead of guesswork.
  *
  * Usage: `sbt "runMain graft.tools.StageProfile <sfDir> <query> [reps]"`.
  * Not part of any driver contract; numbers print as plain text.
  */
object StageProfile {
  def timeIt(label: String, spark: SparkSession)(df: => DataFrame): Double = {
    spark.sparkContext.setJobDescription(label)
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[profile] $label%-40s $s%8.3f s")
    s
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "dedup_edit_distance"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.Tables.t(spark, dir, "customer").count()
    catch { case _: Throwable => }
    (1 to reps).foreach { i =>
      timeIt(s"$name run$i", spark)(graft.SparkEntry.queries(name)(spark, dir))
    }
    spark.stop()
  }
}
