package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.ops.StreamingOps

/** True Structured Streaming semantics (SURVEY §2.B stream_watermark_late +
  * batch/streaming window equivalence): the fixture windows run identically
  * in batch; MemoryStream drives the watermark/late-data behavior that only
  * exists in streaming.
  */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  test("batch window() equals streaming window() on the same closed input") {
    val batch = StreamingOps.streamTumbling(spark, sf).collect().toSeq

    val events = Tables.t(spark, sf, "events")
      .select($"ts", $"event_type").as[(Timestamp, String)].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    stream.addData(events)
    val q = stream.toDF().toDF("ts", "event_type")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros($"window.start").as("ws"), $"event_type", $"cnt")
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out").orderBy("ws", "event_type").collect().toSeq
      assert(streamed == batch)
    } finally q.stop()
  }

  test("withWatermark drops late rows in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long)]
    val agg = stream.toDF().toDF("ts", "v")
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros($"window.start").as("ws"), $"cnt")
    val q = agg.writeStream.format("memory").queryName("late_out")
      .outputMode(OutputMode.Append).start()
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      // Batch 1: two events in hour 10, one in hour 13 (advances event time).
      stream.addData(Seq((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:30:00"), 2L),
        (ts("2024-01-01 13:00:00"), 3L)))
      q.processAllAvailable()
      // Watermark is now 13:00 - 1h = 12:00 → the hour-10 window is closed.
      // Batch 2: a LATE event for hour 10 (before the watermark) must be
      // dropped; an on-time event for hour 13 is kept open.
      stream.addData(Seq((ts("2024-01-01 10:45:00"), 4L), (ts("2024-01-01 13:30:00"), 5L)))
      q.processAllAvailable()
      // Batch 3: advance far enough to close hour 13 too.
      stream.addData(Seq((ts("2024-01-01 20:00:00"), 6L)))
      q.processAllAvailable()
      val out = spark.table("late_out").orderBy("ws").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      val h10 = Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000
      val h13 = Timestamp.valueOf("2024-01-01 13:00:00").getTime * 1000
      // hour-10 window: 2 events (the late 10:45 row dropped); hour-13: 2.
      assert(out.contains((h10, 2L)), s"hour-10 window wrong: ${out.toList}")
      assert(out.contains((h13, 2L)), s"hour-13 window wrong: ${out.toList}")
    } finally q.stop()
  }

  test("update output mode emits only the aggregate rows changed by each batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val q = mem.toDF().toDF("ts", "event_type")
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .writeStream.format("memory").queryName("upd_out")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData((Timestamp.valueOf("2024-01-01 01:00:00"), "click"),
        (Timestamp.valueOf("2024-01-01 01:01:00"), "view"))
      q.processAllAvailable()
      mem.addData((Timestamp.valueOf("2024-01-01 01:02:00"), "click"))
      q.processAllAvailable()
      // The memory sink accumulates each batch's UPDATED rows: batch 1 emits
      // click:1 + view:1, batch 2 re-emits only click:2 — view is unchanged
      // and must not reappear (the delta contract downstream upsert sinks
      // rely on; Complete mode would rewrite everything, Append would wait
      // for finalization).
      val rows = spark.table("upd_out").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows.sorted == Seq(("click", 1L), ("click", 2L), ("view", 1L)),
        s"got $rows")
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch join and drops late rows") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val clicks = MemoryStream[(Long, Long, Timestamp)]    // (user, click_id, ts)
    val purchases = MemoryStream[(Long, Long, Timestamp)] // (user, purchase_id, ts)
    val c = clicks.toDF().toDF("user_id", "click_id", "cts").withWatermark("cts", "10 minutes")
    val p = purchases.toDF().toDF("p_user", "purchase_id", "pts").withWatermark("pts", "10 minutes")
    val joined = c.join(p,
      col("user_id") === col("p_user") &&
      col("pts") >= col("cts") &&
      col("pts") <= col("cts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"))
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode(OutputMode.Append).start()
    try {
      // Batch 1: user 1 clicks at 10:00; purchase at 10:20 → inside the
      // 30-min attribution window. User 2's purchase at 11:00 has no click.
      clicks.addData(Seq((1L, 100L, ts("2024-01-01 10:00:00"))))
      purchases.addData(Seq((1L, 200L, ts("2024-01-01 10:20:00")),
        (2L, 201L, ts("2024-01-01 11:00:00"))))
      q.processAllAvailable()
      // Batch 2: advance both watermarks far past the click (12:00 − 10 min
      // = 11:50 ≫ 10:30 upper bound), evicting user 1's click state.
      clicks.addData(Seq((9L, 101L, ts("2024-01-01 12:00:00"))))
      purchases.addData(Seq((9L, 202L, ts("2024-01-01 12:00:01"))))
      q.processAllAvailable()
      // Batch 3: a purchase that WOULD match user 1's click arrives late —
      // its event time 10:25 is far behind the 11:50 watermark; the click's
      // state is gone, so no new (100, ...) pair may appear.
      purchases.addData(Seq((1L, 203L, ts("2024-01-01 10:25:00"))))
      q.processAllAvailable()
      val rows = spark.table("ssj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set((1L, 100L, 200L), (9L, 101L, 202L)),
        s"state not bounded by watermark or match missed: $rows")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups inside the delay, re-admits after eviction") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, Timestamp)] // (id, ts)
    val q = mem.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
      .writeStream.format("memory").queryName("ddw_out")
      .outputMode(OutputMode.Append).start()
    try {
      // Batch 1: id=1 twice in one batch plus a fresh id=2 → one row each.
      mem.addData(Seq((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:01:00")),
        (2L, ts("2024-01-01 10:02:00"))))
      q.processAllAvailable()
      // Batch 2: id=1 again within the delay → still a duplicate, dropped.
      mem.addData(Seq((1L, ts("2024-01-01 10:05:00"))))
      q.processAllAvailable()
      // Batch 3: advance event time to 11:00 (watermark 10:50 > 10:11 ⇒
      // id=1's dedup state expires), then id=1 once more → re-emitted.
      mem.addData(Seq((3L, ts("2024-01-01 11:00:00"))))
      q.processAllAvailable()
      mem.addData(Seq((1L, ts("2024-01-01 11:01:00"))))
      q.processAllAvailable()
      val ids = spark.table("ddw_out").collect().map(_.getLong(0)).toSeq
      assert(ids.count(_ == 1L) == 2,
        s"expected id=1 emitted exactly twice (once per state generation): $ids")
      assert(ids.count(_ == 2L) == 1 && ids.count(_ == 3L) == 1, s"got $ids")
    } finally q.stop()
  }

  test("streaming as-of enrichment equals the batch sorted-merge result across a batch boundary") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // The fixture's click/purchase timeline in event order, split mid-stream:
    // the ValueState must carry the latest click over the batch boundary.
    val timeline = Tables.t(spark, sf, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select($"user_id", $"event_id",
        when($"event_type" === "click", 0L).otherwise(1L).as("kind"),
        unix_micros($"ts").as("tus"))
      .orderBy("tus", "kind", "event_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val (b1, b2) = timeline.splitAt(timeline.length / 2)
    val mem = MemoryStream[(Long, Long, Long, Long)]
    val q = graft.streaming.StreamingExtract.asofEnrich(mem.toDS())
      .toDF("purchase_id", "user_id", "purchase_us", "click_id", "click_us")
      .writeStream.format("memory").queryName("asof_out")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      val streamed = spark.table("asof_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1).toSeq
      val batch = ops.Relational.joinAsofNative(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4))).toSeq
      assert(streamed.nonEmpty && streamed == batch,
        s"ordered streaming replay must equal the batch as-of (${streamed.length} vs ${batch.length})")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState accumulates per-user spend across micro-batches on RocksDB state") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState requires the RocksDB provider — also the provider a
    // large deployment runs (state in local SST files, not executor heap).
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, Long)] // (user_id, cents)
    val q = graft.streaming.StreamingExtract.spendTracker(mem.toDS())
      .toDF("user_id", "n_events", "total_cents")
      .writeStream.format("memory").queryName("tws_out")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData((1L, 1000L), (1L, 250L), (2L, 99L))
      q.processAllAvailable()
      mem.addData((1L, 50L), (3L, 7L)) // state must survive into batch 2
      q.processAllAvailable()
      val rows = spark.table("tws_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      // Batch 1 emissions:
      assert(rows.contains((1L, 2L, 1250L)) && rows.contains((2L, 1L, 99L)), rows.toString)
      // Batch 2: user 1 continues from stored state; user 3 starts fresh.
      assert(rows.contains((1L, 3L, 1300L)) && rows.contains((3L, 1L, 7L)), rows.toString)
      // Update mode: untouched user 2 is NOT re-emitted in batch 2.
      assert(rows.count(_._1 == 2L) == 1, rows.toString)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("state store reader exposes checkpointed transformWithState state as a DataFrame") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tws-read-ckpt").toString
    val mem = MemoryStream[(Long, Long)]
    val q = graft.streaming.StreamingExtract.spendTracker(mem.toDS())
      .toDF("user_id", "n_events", "total_cents")
      .writeStream.format("memory").queryName("tws_read_out")
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData((1L, 100L), (2L, 70L))
      q.processAllAvailable()
      mem.addData((1L, 30L))
      q.processAllAvailable()
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    // The ops/debugging surface: the named state variable read back OFFLINE
    // from the checkpoint — queryable state without replaying the stream.
    val st = spark.read.format("statestore")
      .option("path", ckpt).option("stateVarName", "spend").load()
      .select("key.value", "value._1", "value._2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(st == Set((1L, 2L, 130L), (2L, 1L, 70L)), st.toString)
  }

  test("transformWithState ListState keeps the last-3 purchases per user, capped across batches") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, Long)]
    val q = graft.streaming.StreamingExtract.recentPurchases(mem.toDS(), 3)
      .toDF("user_id", "recent_cents")
      .writeStream.format("memory").queryName("recent_out")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData((1L, 10L), (1L, 20L))
      q.processAllAvailable()
      mem.addData((1L, 30L), (1L, 40L), (2L, 5L))
      q.processAllAvailable()
      val byUser = spark.table("recent_out").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1)))
      // Final emission per user wins: user 1's list slid to the last 3
      // across the batch boundary; user 2 holds its single purchase.
      assert(byUser.contains((1L, Seq(10L, 20L))), byUser.mkString(", "))
      assert(byUser.contains((1L, Seq(20L, 30L, 40L))), byUser.mkString(", "))
      assert(byUser.contains((2L, Seq(5L))), byUser.mkString(", "))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState MapState accumulates per-category spend; untouched keys stay silent") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, String, Long)]
    val q = graft.streaming.StreamingExtract.categorySpend(mem.toDS())
      .toDF("user_id", "category", "cents")
      .writeStream.format("memory").queryName("cat_out")
      .outputMode(OutputMode.Update).start()
    try {
      mem.addData((1L, "books", 100L), (1L, "games", 50L))
      q.processAllAvailable()
      mem.addData((1L, "books", 25L)) // only this key may re-emit
      q.processAllAvailable()
      val rows = spark.table("cat_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      assert(rows.contains((1L, "books", 100L)) && rows.contains((1L, "games", 50L)))
      assert(rows.contains((1L, "books", 125L)), s"map value must accumulate: $rows")
      assert(rows.count(_._2 == "games") == 1,
        s"untouched category re-emitted: $rows")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState event-time timers: unanswered click emits abandonment, purchase cancels it") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def ts(s: String) = Timestamp.valueOf(s)
    val mem = MemoryStream[(Long, String, Timestamp)] // (user, kind, event time)
    val input = mem.toDF().toDF("user_id", "kind", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(Long, String, Timestamp)]
    // 10-minute purchase window after a click.
    val q = graft.streaming.StreamingExtract.abandonDetector(input, 10L * 60 * 1000 * 1000)
      .toDF("user_id", "click_us")
      .writeStream.format("memory").queryName("abandon_out")
      .outputMode(OutputMode.Append).start()
    try {
      // User 1 clicks and purchases in time; user 2 clicks and goes silent.
      mem.addData((1L, "click", ts("2024-01-01 00:00:00")),
        (2L, "click", ts("2024-01-01 00:01:00")))
      q.processAllAvailable()
      mem.addData((1L, "purchase", ts("2024-01-01 00:05:00")))
      q.processAllAvailable()
      assert(spark.table("abandon_out").isEmpty,
        "no timer may fire before the watermark passes the deadline")
      // Watermark jumps past both deadlines: only user 2's timer survives.
      mem.addData((3L, "click", ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      val out = spark.table("abandon_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(out == Seq((2L, ts("2024-01-01 00:01:00").getTime * 1000)),
        s"exactly user 2's click abandons: $out")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("session_window gap is inclusive: merge at exactly +gap, split strictly after") {
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:00")),
      (1L, ts("2024-01-01 00:29:59")),        // +29:59 → same session
      (1L, ts("2024-01-01 00:59:59")),        // +30:00 EXACTLY → still merges
      (1L, ts("2024-01-01 01:29:59.000001")), // +30:00.000001 → NEW session
      (2L, ts("2024-01-01 00:00:00")))
    val df = rows.toDF("user_id", "ts")
    val sessions = df.groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select($"user_id", unix_micros($"session_window.start").as("s"), $"n")
      .orderBy("user_id", "s").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(sessions == Seq((1L, 3L), (1L, 1L), (2L, 1L)), sessions.toString)
  }

  test("stream_watermark_late reconstruction matches a real watermarked replay") {
    // Constructed ingest: 30 events 5 min apart; the op's own LCG jitter
    // decides each event's arrival minute. The batch reconstruction (via a
    // temp fixture dir) must agree with a REAL watermarked streaming replay
    // of the same arrival schedule: rows surviving a
    // withWatermark+dropDuplicates stream are exactly the batch side's
    // "kept", per event-hour.
    val dir = java.nio.file.Files.createTempDirectory("graft-late").toString
    val baseUs = 1704067200000000L // 2024-01-01 00:00:00 UTC
    val rows = (0L until 30L).map { id =>
      val tus = baseUs + id * 300000000L
      (id, new Timestamp(tus / 1000))
    }
    rows.toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val batchSide = StreamingOps.streamWatermarkLate(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(batchSide.map(_._3).sum > 0, "constructed fixture produced no late rows")

    // Replay in arrival order: batch = (event time + jitter) // 1 min.
    val byBatch = rows.groupBy { case (id, ts) =>
      val jit = ((id * 1103515245L + 12345L) % 2147483647L) % StreamingOps.LateJitterUs
      (ts.getTime * 1000 + jit) / StreamingOps.LateTriggerUs
    }.toSeq.sortBy(_._1).map(_._2)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp)]
    val q = stream.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicates("event_id", "ts")
      .writeStream.format("memory").queryName("late_replay")
      .outputMode(OutputMode.Append).start()
    try {
      byBatch.foreach { chunk => stream.addData(chunk); q.processAllAvailable() }
      val kept = spark.table("late_replay")
        .groupBy(floor(unix_micros($"ts") / lit(3600L * 1000000)).cast("long").as("h"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val expected = batchSide.map(r => (r._1, r._4)).toMap
      assert(kept == expected.filter(_._2 > 0),
        s"streaming kept $kept vs batch reconstruction $expected")
    } finally q.stop()
  }
}
