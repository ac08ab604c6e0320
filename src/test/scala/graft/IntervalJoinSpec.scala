package graft

import org.apache.spark.sql.functions._

/** Hardening suite for the native keyed interval join
  * ([[graft.plans.IntervalJoinExec]]) — the [[PlansSpec]] as-of contract
  * applied to the second whole-operator extension: constructed boundary
  * semantics, sliding-buffer eviction, a seeded brute-force differential,
  * exchange realignment, plan shape, and entry validation.
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def join(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame,
      lo: Long, hi: Long) =
    org.apache.spark.sql.graft.Interval.intervalJoin(
      l, r, Seq("user_id"), Seq("cu"), "pus", "cus", lo, hi)

  test("interval join: inclusive boundaries, sliding eviction, per-key isolation, nulls") {
    val p = Seq((1L, Some(1L), Some(10L)), (2L, Some(1L), Some(25L)),
      (3L, Some(1L), Some(100L)), (4L, Some(2L), Some(16L)), (5L, Some(2L), Some(15L)),
      (6L, None, Some(10L)))
      .toDF("pid", "user_id", "pus")
    val c = Seq((100L, Some(1L), Some(0L)), (110L, Some(1L), Some(10L)),
      (120L, Some(1L), Some(20L)), (130L, Some(1L), Some(30L)), (135L, Some(1L), Some(35L)),
      (205L, Some(2L), Some(5L)), (299L, Some(2L), None))
      .toDF("cid", "cu", "cus")
    val got = join(p, c, -10L, 10L).select("pid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // p1 [0,20] → clicks 0/10/20 (BOTH window edges inclusive); p2 [15,35]
    // → 20/30/35 (0 and 10 must be EVICTED by then — the sliding buffer);
    // p3 [90,110] → nothing (inner: absent); p5 [5,25] → the user-2 click
    // at the exact low edge; p4 [6,26] → nothing; null user / null click
    // time never match.
    assert(got == Set(
      (1L, 100L), (1L, 110L), (1L, 120L),
      (2L, 120L), (2L, 130L), (2L, 135L),
      (5L, 205L)), got.toString)
  }

  test("interval join: Long.MaxValue edges saturate instead of wrapping") {
    // hi = Long.MaxValue means "unbounded forward": lt + hi must clamp,
    // not wrap negative (a wrapped edge silently empties the join).
    val p = Seq((1L, 1L, 10L)).toDF("pid", "user_id", "pus")
    val c = Seq((100L, 1L, 5L), (110L, 1L, 10L), (120L, 1L, 1000000L))
      .toDF("cid", "cu", "cus")
    val fwd = join(p, c, 0L, Long.MaxValue).select("cid").collect().map(_.getLong(0)).toSet
    assert(fwd == Set(110L, 120L), s"unbounded-forward window: $fwd")
    val back = join(p, c, Long.MinValue, 0L).select("cid").collect().map(_.getLong(0)).toSet
    assert(back == Set(100L, 110L), s"unbounded-backward window: $back")
  }

  test("interval join: asymmetric lookback window [-20, -5] takes strictly-prior rows only") {
    val p = Seq((1L, 1L, 30L)).toDF("pid", "user_id", "pus")
    val c = Seq((110L, 1L, 10L), (120L, 1L, 20L), (126L, 1L, 26L), (130L, 1L, 30L))
      .toDF("cid", "cu", "cus")
    val got = join(p, c, -20L, -5L).select("cid").collect().map(_.getLong(0)).toSet
    assert(got == Set(110L, 120L), s"window [10,25] must take exactly 10 and 20: $got")
  }

  test("interval join matches a brute-force reference on a seeded adversarial corpus") {
    val rng = new scala.util.Random(41)
    val ps = (1 to 400).map(i => (i.toLong, rng.nextInt(5).toLong, rng.nextInt(200).toLong))
    val cs = (1 to 400).map(i => (i.toLong + 1000, rng.nextInt(5).toLong, rng.nextInt(200).toLong))
    val (lo, hi) = (-7L, 3L)
    val got = join(ps.toDF("pid", "user_id", "pus"), cs.toDF("cid", "cu", "cus"), lo, hi)
      .select("pid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (pid, pu, pt) <- ps; (cid, cu, ct) <- cs
      if pu == cu && ct >= pt + lo && ct <= pt + hi
    } yield (pid, cid)).toSet
    assert(want.nonEmpty && want.size < ps.size * cs.size / 5,
      "fixture must be selective but non-vacuous")
    assert(got == want, s"diff: extra=${got.diff(want).take(5)} missing=${want.diff(got).take(5)}")
  }

  test("left-outer interval join matches a brute-force reference on the same adversarial corpus") {
    val rng = new scala.util.Random(43)
    val ps = (1 to 400).map(i => (i.toLong, rng.nextInt(5).toLong, rng.nextInt(200).toLong))
    val cs = (1 to 400).map(i => (i.toLong + 1000, rng.nextInt(5).toLong, rng.nextInt(200).toLong))
    val (lo, hi) = (-7L, 3L)
    val got = org.apache.spark.sql.graft.Interval.intervalJoin(
        ps.toDF("pid", "user_id", "pus"), cs.toDF("cid", "cu", "cus"),
        Seq("user_id"), Seq("cu"), "pus", "cus", lo, hi, isInner = false)
      .select("pid", "cid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val inner = (for {
      (pid, pu, pt) <- ps; (cid, cu, ct) <- cs
      if pu == cu && ct >= pt + lo && ct <= pt + hi
    } yield (pid, cid)).toSet
    val matchedLeft = inner.map(_._1)
    val want = inner ++ ps.map(_._1).filterNot(matchedLeft).map(p => (p, -1L))
    assert(want.size > inner.size, "fixture must leave some probes windowless")
    assert(got == want, s"diff: extra=${got.diff(want).take(5)} missing=${want.diff(got).take(5)}")
    // Null key / null time probes also retain with null right columns.
    val nullProbe = org.apache.spark.sql.graft.Interval.intervalJoin(
        Seq((1L, Option.empty[Long], Some(5L)), (2L, Some(1L), Option.empty[Long]))
          .toDF("pid", "user_id", "pus"),
        Seq((9L, 1L, 5L)).toDF("cid", "cu", "cus"),
        Seq("user_id"), Seq("cu"), "pus", "cus", lo, hi, isInner = false)
      .select("pid", "cid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(nullProbe == Set((1L, -1L), (2L, -1L)), nullProbe.toString)
  }

  test("interval join realigns mismatched pre-partitioned sides under and without AQE") {
    val l = (0 until 500).map(i => (i.toLong, (i % 7).toLong, i.toLong * 10))
      .toDF("pid", "user_id", "pus").repartition(3, col("user_id"))
    val r = (0 until 500).map(i => (i.toLong + 5000, (i % 7).toLong, i.toLong * 10))
      .toDF("cid", "cu", "cus").repartition(11, col("cu"))
    // Same-key same-time rows pair exactly once under a [0, 0] window.
    def run(): Long = join(l, r, 0L, 0L).count()
    assert(run() == 500L)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try assert(run() == 500L)
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("interval join plans as one sweep with one exchange per side; raw collect is Unsafe") {
    val p = (1 to 100).map(i => (i.toLong, (i % 7).toLong, i.toLong * 10))
      .toDF("pid", "user_id", "pus")
    val c = (1 to 100).map(i => (i.toLong + 1000, (i % 7).toLong, i.toLong * 9))
      .toDF("cid", "cu", "cus")
    val df = join(p, c, -50L, 50L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin ["), s"custom exec missing:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop"), s"BNLJ leaked in:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges:\n$plan")
    // Raw collect with no projection above the exec — UnsafeRow contract.
    val raw = df.collect()
    assert(raw.nonEmpty && raw.head.length == 6)
  }

  test("interval join fixture query matches the composed grid form and entry validation holds") {
    // The registered query (same-user clicks ±15 min per purchase) must
    // agree row-for-row with the composed (user, grid-cell) + residual
    // form on the real fixture.
    val got = ops.Relational.joinIntervalNative(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = Tables.t(spark, sf, "events")
    val H = 900000000L
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tus"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id").as("cu"),
        unix_micros(col("ts")).as("cus"))
    val expected = p.join(c, col("user_id") === col("cu") &&
        abs(col("tus") - col("cus")) <= H)
      .groupBy("event_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got == expected)
    // Entry validation: empty window, mismatched key types.
    val e1 = intercept[IllegalArgumentException](join(
      Seq((1L, 1L, 1L)).toDF("pid", "user_id", "pus"),
      Seq((1L, 1L, 1L)).toDF("cid", "cu", "cus"), 5L, -5L))
    assert(e1.getMessage.contains("empty"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](join(
      Seq((1L, 1L, 1L)).toDF("pid", "user_id", "pus"),
      Seq((1L, 1, 1L)).toDF("cid", "cu", "cus"), -5L, 5L))
    assert(e2.getMessage.contains("key type mismatch"), e2.getMessage)
  }
}
