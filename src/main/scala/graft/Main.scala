package graft

import org.apache.spark.sql.SparkSession

import graft.extract.{ExtractorRegistry, FileWatermarkStore, Pipeline}
import graft.model.{IterateType, ReplicationMethod, TableConfig}

/** Product-shaped entry point: a config-driven multi-table replication run —
  * the engine used the way the reference is used (a pipeline of TableConfigs
  * per connection, README.md:33-42), end to end: variant resolution →
  * extract decision tree → sink write → watermark persistence.
  *
  * Usage: runMain graft.Main <sfDir> <outDir> [runs]
  *
  * Each run replays the pipeline: full tables overwrite, incremental tables
  * extract only past the persisted watermark (second run of `events` is the
  * boundary row alone — the reference's inclusive at-least-once re-read,
  * mkpipe_extractor_clickhouse/__init__.py:89).
  *
  * A second phase loads the `documents` table through the INDEXED
  * incremental-dedup sink ([[graft.streaming.StreamingExtract.incrementalDedupSink]]):
  * each run uses a FRESH checkpoint, so the whole table is re-delivered
  * every time — the at-least-once worst case. Run 1 admits every
  * non-duplicate document (in-batch exact/near dedup applies on the first
  * load too) and writes the sidecar index; later runs drop every re-delivery against
  * the STORED index (the sink itself is never re-read or re-banded) and
  * append nothing.
  */
object Main {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-out").toString)
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The pipeline a reference user would configure: dims full-refresh,
    // facts incremental on their natural iterate columns.
    val tables = Seq(
      TableConfig("region"),
      TableConfig("nation"),
      TableConfig("customer"),
      TableConfig("orders", targetName = Some("orders_replica")),
      TableConfig("events",
        replicationMethod = ReplicationMethod.Incremental,
        iterateColumn = Some("ts"), iterateColumnType = IterateType.DatetimeCol),
      TableConfig("lineitem",
        replicationMethod = ReplicationMethod.Incremental,
        iterateColumn = Some("l_orderkey"), iterateColumnType = IterateType.IntCol))

    val store = new FileWatermarkStore(java.nio.file.Paths.get(outDir, "_watermarks.properties"))
    val pipeline = new Pipeline(ExtractorRegistry("parquet")(sfDir), store)

    for (run <- 1 to runs) {
      val results = pipeline.run(spark, tables, outDir)
      val summary = results.map { case (name, r) =>
        // Count the WRITTEN sink, not r.df — the pipeline has already
        // unpersisted the batch, so df.count() would re-execute the whole
        // extract (on a live JDBC source: a second full source read per
        // table, purely for a log line).
        val target = tables.find(_.name == name).map(_.effectiveTargetName).getOrElse(name)
        // No Try-swallow here: if the extract claims it wrote a batch, an
        // unreadable sink (corrupt footer, permissions) is a real failure
        // and must crash the run, not report sink_rows=0.
        val rows =
          if (r.toOption.exists(_.df.isDefined))
            spark.read.parquet(s"$outDir/$target").count()
          else 0L
        val wm = r.toOption.flatMap(_.lastPoint).getOrElse("-")
        s"$name sink_rows=$rows watermark=$wm"
      }.mkString("; ")
      println(s"[graft.Main] run $run: $summary")
    }

    // Phase 2: curated document load, every run a full re-delivery. The
    // fixture is a single parquet FILE and the file stream source requires
    // a directory, so stage it as the extract-landing dir first.
    val docsSrc = s"$outDir/documents_src"
    spark.read.parquet(s"$sfDir/documents.parquet")
      .write.mode("overwrite").parquet(docsSrc)
    val docsSchema = spark.read.parquet(docsSrc).schema
    val dedupSink = s"$outDir/documents_deduped"
    for (run <- 1 to runs) {
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft-dedup-ckpt$run").toString
      graft.streaming.StreamingExtract.incrementalDedupSink(
        spark.readStream.schema(docsSchema).parquet(docsSrc), dedupSink, ckpt)
        .awaitTermination()
      val sinkDocs = spark.read.parquet(dedupSink).count()
      println(s"[graft.Main] curated load run $run: sink_docs=$sinkDocs" +
        (if (run > 1) " (full re-delivery deduped against the stored index)" else ""))
    }

    // Phase 3: streaming distinct-user counts into the theta-sketch sink —
    // per-event_type audience sketches maintained incrementally (kilobytes
    // of state), queried without touching the event history. Fresh
    // checkpoint per run → every run re-delivers everything; sketch union
    // is idempotent, so the estimates are identical after each run.
    val evSrc = s"$outDir/events_sketch_src"
    graft.Tables.t(spark, sfDir, "events") // ns-timestamp-safe events read
      .selectExpr("event_type AS segment", "user_id AS member")
      .write.mode("overwrite").parquet(evSrc)
    val sketchSink = s"$outDir/audience_sketches"
    for (run <- 1 to runs) {
      val ckpt = java.nio.file.Files.createTempDirectory(s"graft-sk-ckpt$run").toString
      graft.streaming.StreamingExtract.sketchDistinctSink(
        spark.readStream.schema(spark.read.parquet(evSrc).schema).parquet(evSrc),
        sketchSink, ckpt)
        .awaitTermination()
      val est = graft.streaming.StreamingExtract.sketchEstimates(spark, sketchSink)
        .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", ")
      println(s"[graft.Main] audience sketches run $run: $est" +
        (if (run > 1) " (re-delivery merged idempotently)" else ""))
    }
    // Phase 4: transformWithState running spend profiles (RocksDB state) —
    // the streaming feature store. Purchases stream in multiple micro-batches
    // (maxFilesPerTrigger=1), the StatefulProcessor folds each user's
    // lifetime (count, cents) in typed ValueState, and the final emission per
    // user must equal the batch aggregate over the same rows — state
    // carrying across micro-batches is exactly what makes them agree.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import org.apache.spark.sql.functions.{col, count, floor, lit, max, sum}
    val spendSrc = s"$outDir/events_spend_src"
    val evCents = graft.Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    evCents.filter(col("user_id") % 2 === 0).write.mode("overwrite").parquet(spendSrc)
    evCents.filter(col("user_id") % 2 === 1).write.mode("append").parquet(spendSrc)
    import spark.implicits._
    val spendCkpt = java.nio.file.Files.createTempDirectory("graft-spend-ckpt").toString
    val q = graft.streaming.StreamingExtract.spendTracker(
        spark.readStream.schema(spark.read.parquet(spendSrc).schema)
          .option("maxFilesPerTrigger", 1).parquet(spendSrc)
          .as[(Long, Long)])
      .toDF("user_id", "n_events", "total_cents")
      .writeStream.format("memory").queryName("spend_profiles")
      .outputMode("update")
      .option("checkpointLocation", spendCkpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // Totals are monotone per user, so max over emissions = final state.
    val live = spark.table("spend_profiles").groupBy("user_id")
      .agg(max("n_events").as("n"), max("total_cents").as("cents"))
    val batch = evCents.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
    val agree = live.join(batch, Seq("user_id", "n", "cents")).count()
    val users = batch.count()
    println(s"[graft.Main] spend profiles: $users users tracked, " +
      s"$agree match the batch aggregate" +
      (if (agree == users) " (streaming state ≡ batch)" else " MISMATCH"))

    // Phase 5: graph analytics over the extracted lake — the trade graph is
    // built ONCE (memoized, localCheckpoint'ed) and three consumers share
    // it: the degree histogram (the skew question), fixed-point PageRank
    // (bit-exact ranking), and the co-purchase triangle census. The phase
    // demonstrates the load-once/query-many contract the memo encodes.
    val degrees = graft.ops.Graph.graphDegreeStats(spark, sfDir).collect()
    val topRank = graft.ops.Graph.graphPagerank(spark, sfDir).head()
    val nTriangles = graft.ops.Graph.graphTriangles(spark, sfDir).count()
    val degStr = degrees.map(r =>
      s"${r.getString(0)}[2^${r.getLong(1) - 1}]=${r.getLong(2)}").mkString(", ")
    println(s"[graft.Main] graph: degree buckets $degStr; " +
      s"top pagerank node=${topRank.getLong(0)} pr=${topRank.getLong(1)}; " +
      s"co-purchase triangles=$nTriangles")

    // Phase 6: training-mix planning over the curated corpus — the r9
    // composition: temperature-scaled language weights (p ∝ q^0.7) set the
    // per-language budget, the EXACT prefix-filter jaccard join reports
    // residual near-dup pairs the curation would drop, and the PCA spectrum
    // summarizes the embedding space the mix will train on. Three consumers
    // of two memoized loads (shingle table, PCA statistics) — plan-once /
    // query-many, end to end.
    val mix = graft.ops.Analytics.sampleTemperature(spark, sfDir).collect()
      .map(r => s"${r.getString(0)}:${r.getLong(4)}").mkString(" ")
    val nearDups = graft.ops.LlmPipeline.dedupJaccardPrefix(spark, sfDir).count()
    val spectrum = graft.ops.LlmPipeline.embedPca(spark, sfDir).collect()
      .map(r => s"${r.getLong(2)}ppm").mkString(" ")
    println(s"[graft.Main] mix plan: draws/10k $mix; " +
      s"residual near-dup pairs (J≥0.8)=$nearDups; top-5 EVR $spectrum")

    // Phase 7: point-in-time serving — the as-of triad on one timeline.
    // The custom sorted-merge operator (backfill over the lake) and the
    // carry-forward window (the state machine as SQL) produce the same
    // enrichment; the demo runs both and asserts the agreement the specs
    // pin, then reports coverage — the feature-store freshness readout.
    val merged = graft.ops.Relational.joinAsofNative(spark, sfDir)
    val nPurch = merged.count()
    val nEnriched = merged.filter(org.apache.spark.sql.functions.col("click_id").isNotNull).count()
    val viaWindow = graft.ops.StreamingOps.streamAsof(spark, sfDir).count()
    require(viaWindow == nPurch, "as-of regimes disagree on row count")
    println(s"[graft.Main] as-of serving: $nEnriched/$nPurch purchases carry " +
      "a prior-click feature (merge operator ≡ carry-forward window)")

    // Phase 8: corpus quality gating — the funnel reports which gate eats
    // the data, the novelty SINK scores two ingest rounds against its
    // growing first-seer sidecar (the incremental face of the batch
    // novelty query), and the cadence screen flags non-human traffic the
    // events pipeline should quarantine.
    val funnel = graft.ops.Analytics.textFilterFunnel(spark, sfDir).collect()
      .map(r => s"${r.getString(0)}→${r.getLong(2)}").mkString(" ")
    val nvSink = s"$outDir/novelty_scored"
    val docs = graft.Tables.t(spark, sfDir, "documents").select("doc_id", "text")
    // Split on the MEDIAN doc_id, not count()/2: offset or sparse id
    // spaces would make a count-based split lopsided or empty.
    val midRow = docs.agg(org.apache.spark.sql.functions
      .expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY doc_id)").cast("long"))
      .head()
    // NULL median (zero docs): both rounds run empty instead of NPEing.
    val midId = if (midRow.isNullAt(0)) Long.MinValue else midRow.getLong(0)
    graft.streaming.StreamingExtract.noveltyLoadBatch(
      spark, docs.filter(col("doc_id") <= midId), nvSink)
    graft.streaming.StreamingExtract.noveltyLoadBatch(
      spark, docs.filter(col("doc_id") > midId), nvSink)
    val scored = spark.read.parquet(nvSink)
    val meanNovelty = scored.agg(
      org.apache.spark.sql.functions.expr("sum(novelty_micro) div count(1)"))
      .head().getLong(0)
    val bots = graft.ops.Analytics.eventsBotDetect(spark, sfDir)
      .groupBy("cadence_class").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
    println(s"[graft.Main] quality gates: funnel $funnel; " +
      s"novelty sink scored ${scored.count()} docs over 2 rounds " +
      s"(mean ${meanNovelty}ppm); cadence $bots")
    spark.stop()
  }
}
