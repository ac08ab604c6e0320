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
    if (name == "dedup_edit_distance") profileEditDistance(spark, dir)
    if (name == "cdc_apply") profileCdcApply(spark, dir)
    if (name == "dedup_semantic") profileSemantic(spark, dir)
    spark.stop()
  }

  /** Stage decomposition of [[graft.ops.LlmPipeline.dedupSemantic]] —
    * k-means fit, the projected/checkpointed embedding table, candidate
    * pairs, component labels, and the final rollup, each timed through the
    * noop sink (the label stage is timed around the loop since the loop
    * itself runs actions).
    */
  private def profileSemantic(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    graft.ops.LlmPipeline.kMeansCentroids(spark, dir, 10, 2)
    println(f"[profile] ${"kmeans fit (memoized)"}%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    val te = System.nanoTime()
    val emb = graft.ops.LlmPipeline.semanticEmb(spark, dir)
    println(f"[profile] ${"emb project+checkpoint"}%-40s ${(System.nanoTime() - te) / 1e9}%8.3f s")
    val pairs = graft.ops.LlmPipeline.semanticPairs(emb, 0.45)
    timeIt("semantic candidate pairs", spark)(pairs)
    val cp = pairs.localCheckpoint()
    val t1 = System.nanoTime()
    graft.ops.LlmPipeline.componentLabels(cp).count()
    println(f"[profile] ${"component labels"}%-40s ${(System.nanoTime() - t1) / 1e9}%8.3f s")
    timeIt("full dedup_semantic", spark)(
      graft.SparkEntry.queries("dedup_semantic")(spark, dir))
  }

  /** Variant matrix for [[graft.ops.Analytics.cdcApply]] — changelog
    * construction (5 re-scans vs 1 scan + per-row generator) × apply
    * (twin windows vs max-struct aggregate), so the 2×2 is measured, not
    * assumed.
    */
  private def profileCdcApply(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.{Column, DataFrame}
    import org.apache.spark.sql.expressions.Window
    val base = graft.Tables.t(spark, dir, "orders")
      .select(col("o_orderkey").as("k"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    def scanWave(pred: Column, seq: Int, op: String, newCents: Column): DataFrame =
      base.filter(pred).select(col("k"), lit(seq.toLong).as("seq"),
        lit(op).as("op"), newCents.as("cents"))
    val unionAllScans = scanWave(col("k") % 4 =!= 3, 0, "S", col("cents"))
      .unionAll(scanWave(col("k") % 4 === 3, 1, "I", col("cents")))
      .unionAll(scanWave(col("k") % 3 === 0, 2, "U", col("cents") + 11111L))
      .unionAll(scanWave(col("k") % 6 === 0, 3, "U", col("cents") + 22222L))
      .unionAll(scanWave(col("k") % 7 === 0, 4, "D", lit(0L)))
    def genWave(pred: Column, seq: Int, op: String, newCents: Column): Column =
      when(pred, struct(lit(seq.toLong).as("seq"), lit(op).as("op"),
        newCents.as("cents")))
    val waves = array(
      genWave(col("k") % 4 =!= 3, 0, "S", col("cents")),
      genWave(col("k") % 4 === 3, 1, "I", col("cents")),
      genWave(col("k") % 3 === 0, 2, "U", col("cents") + 11111L),
      genWave(col("k") % 6 === 0, 3, "U", col("cents") + 22222L),
      genWave(col("k") % 7 === 0, 4, "D", lit(0L)))
    val generated = base
      .select(col("k"), explode(filter(waves, w => w.isNotNull)).as("w"))
      .select(col("k"), col("w.seq").as("seq"), col("w.op").as("op"),
        col("w.cents").as("cents"))
    def applyWindows(all: DataFrame): DataFrame = {
      val wLatest = Window.partitionBy("k").orderBy(col("seq").desc)
      val wKey = Window.partitionBy("k")
      all.withColumn("rn", row_number().over(wLatest))
        .withColumn("n_versions", count(lit(1)).over(wKey))
        .filter(col("rn") === 1 && col("op") =!= "D")
        .select(col("k").as("o_orderkey"), col("cents"), col("op").as("last_op"),
          col("n_versions"))
        .orderBy("o_orderkey")
    }
    def applyAgg(all: DataFrame): DataFrame = all
      .groupBy("k")
      .agg(max(struct(col("seq"), col("op"), col("cents"))).as("last"),
        count(lit(1)).as("n_versions"))
      .filter(col("last.op") =!= "D")
      .select(col("k").as("o_orderkey"), col("last.cents").as("cents"),
        col("last.op").as("last_op"), col("n_versions"))
      .orderBy("o_orderkey")
    (1 to 2).foreach { r =>
      timeIt(s"scan5+windows r$r", spark)(applyWindows(unionAllScans))
      timeIt(s"scan5+agg r$r", spark)(applyAgg(unionAllScans))
      timeIt(s"gen1+windows r$r", spark)(applyWindows(generated))
      timeIt(s"gen1+agg r$r", spark)(applyAgg(generated))
    }
  }

  /** Stage decomposition of [[graft.ops.LlmPipeline.dedupEditDistance]] —
    * replicates its pipeline stage by stage so the expensive one is
    * measured, not guessed (the stages share no state with the real query;
    * each is timed through the noop sink).
    */
  private def profileEditDistance(spark: SparkSession, dir: String,
      k: Int = 8, q: Int = 8): Unit = {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("ln"))
    timeIt("1 gd explode grams (HOF stack)", spark)(docs.select(col("doc_id"), col("ln"), explode(expr(
      s"CASE WHEN length(text) >= $q THEN array_distinct(transform(" +
        s"sequence(1, length(text) - $q + 1), i -> xxhash64(substring(text, i, $q)))) " +
        s"ELSE CAST(array() AS array<bigint>) END")).as("gram")))
    timeIt("1n gd native generator", spark)(docs.select(col("doc_id"), col("ln"),
      graft.functions.QGramHashes.qgramHashes(spark, col("text"), lit(q)).as(Seq("gram"))))
    val gd = docs.select(col("doc_id"), col("ln"),
      graft.functions.QGramHashes.qgramHashes(spark, col("text"), lit(q)).as(Seq("gram")))
      .localCheckpoint()
    timeIt("2 gs sorted arrays", spark)(gd.groupBy("doc_id")
      .agg(sort_array(collect_list(col("gram"))).as("gs"), count(lit(1)).as("m")))
    val gs = gd.groupBy("doc_id")
      .agg(sort_array(collect_list(col("gram"))).as("gs"), count(lit(1)).as("m"))
      .localCheckpoint()
    val docFreq = gd.groupBy("gram").agg(count(lit(1)).as("ddf"))
    timeIt("3 pre prefix build", spark)(gd.join(docFreq, "gram")
      .groupBy("doc_id", "ln")
      .agg(sort_array(collect_list(struct(col("ddf"), col("gram")))).as("ord"))
      .select(col("doc_id"), col("ln"),
        explode(slice(transform(col("ord"), o => o.getField("gram")),
          lit(1), lit(k * q + 1))).as("gram")))
    timeIt("3w pre via window", spark) {
      import org.apache.spark.sql.expressions.Window
      gd.join(docFreq, "gram")
        .withColumn("rn", row_number().over(
          Window.partitionBy("doc_id").orderBy("ddf", "gram")))
        .filter(col("rn") <= k * q + 1)
        .select(col("doc_id"), col("ln"), col("gram"))
    }
    val pre = gd.join(docFreq, "gram")
      .groupBy("doc_id", "ln")
      .agg(sort_array(collect_list(struct(col("ddf"), col("gram")))).as("ord"))
      .select(col("doc_id"), col("ln"),
        explode(slice(transform(col("ord"), o => o.getField("gram")),
          lit(1), lit(k * q + 1))).as("gram"))
      .localCheckpoint()
    val cand = pre.select(col("gram"), col("doc_id").as("doc_a"), col("ln").as("ln_a"))
      .join(pre.select(col("gram"), col("doc_id").as("doc_b"), col("ln").as("ln_b")), "gram")
      .filter(col("doc_a") < col("doc_b") && abs(col("ln_a") - col("ln_b")) <= k)
      .select("doc_a", "doc_b")
    timeIt("4 cand self-join", spark)(cand)
    val counted = cand.distinct()
      .join(gs.select(col("doc_id").as("doc_a"), col("gs").as("gs_a"), col("m").as("m_a")),
        Seq("doc_a"), "left")
      .join(gs.select(col("doc_id").as("doc_b"), col("gs").as("gs_b"), col("m").as("m_b")),
        Seq("doc_b"), "left")
      .filter(coalesce(size(array_intersect(col("gs_a"), col("gs_b"))).cast("long"), lit(0L)) >=
        greatest(coalesce(col("m_a"), lit(0L)), coalesce(col("m_b"), lit(0L))) - lit(k.toLong * q))
      .select("doc_a", "doc_b")
    timeIt("5 count filter", spark)(counted)
    val cn = counted.localCheckpoint()
    val ta = docs.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
    val tb = docs.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
    timeIt("6 verify levenshtein", spark)(cn
      .join(ta, "doc_a").join(tb, "doc_b")
      .filter(levenshtein(col("text_a"), col("text_b")) <= k)
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("text_a"), col("text_b")).cast("long").as("edit_distance")))
    timeIt("6t verify thresholded", spark)(cn
      .join(ta, "doc_a").join(tb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("text_a"), col("text_b"), k).as("d"))
      .filter(col("d") >= 0)
      .select(col("doc_a"), col("doc_b"), col("d").cast("long").as("edit_distance")))
  }
}
