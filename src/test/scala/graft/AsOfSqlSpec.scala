package graft

import org.apache.spark.sql.SparkSession

import graft.plans.AsOfSqlRewrite

/** The SQL surface of the native as-of operator: the `AsOfSqlRewrite`
  * text kernel, the vanilla-session `AsOf.sql` entry, error paths, and
  * (in [[ExtensionsSpec]]'s style) the injected-parser path where plain
  * `spark.sql` understands `ASOF JOIN … MATCH_CONDITION`.
  */
class AsOfSqlSpec extends SparkSpec {
  import spark.implicits._

  // ---- text-rewrite kernel (no Spark involved) ----

  test("rewrite: bare ASOF JOIN becomes a LEFT JOIN with the inner marker") {
    val out = AsOfSqlRewrite(
      "SELECT * FROM t ASOF JOIN q ON t.sym = q.sym MATCH_CONDITION (t.ts >= q.ts)")
    assert(out == "SELECT * FROM t LEFT JOIN q ON (t.sym = q.sym) AND " +
      "graft_asof_match_inner(t.ts, q.ts)", out)
  }

  test("rewrite: ASOF LEFT JOIN keeps left-outer marker; <= swaps sides; TIEBREAK appends") {
    val out = AsOfSqlRewrite(
      "SELECT * FROM t ASOF LEFT JOIN q ON t.sym = q.sym " +
        "MATCH_CONDITION (q.ts <= t.ts) TIEBREAK (q.seq)")
    assert(out == "SELECT * FROM t LEFT JOIN q ON (t.sym = q.sym) AND " +
      "graft_asof_match(t.ts, q.ts, q.seq)", out)
  }

  test("rewrite: string literals and comments are inert; subquery relations survive") {
    val lit = "SELECT 'an ASOF JOIN x ON y MATCH_CONDITION (a >= b)' AS s FROM t"
    assert(AsOfSqlRewrite(lit) eq lit, "literal must not be rewritten")
    val cmt = "SELECT * FROM t -- ASOF JOIN q ON x MATCH_CONDITION (a >= b)\nWHERE 1=1"
    assert(AsOfSqlRewrite(cmt) eq cmt, "comment must not be rewritten")
    val sub = AsOfSqlRewrite(
      "SELECT * FROM t ASOF JOIN (SELECT sym, ts FROM raw WHERE k = 'ON x') q " +
        "ON t.sym = q.sym MATCH_CONDITION (t.ts >= q.ts)")
    assert(sub.contains("LEFT JOIN (SELECT sym, ts FROM raw WHERE k = 'ON x') q"), sub)
    assert(sub.contains("graft_asof_match_inner(t.ts, q.ts)"), sub)
  }

  test("rewrite: strict > and < map to the _strict markers; < swaps sides") {
    val gt = AsOfSqlRewrite(
      "SELECT * FROM t ASOF JOIN q ON t.sym = q.sym MATCH_CONDITION (t.ts > q.ts)")
    assert(gt == "SELECT * FROM t LEFT JOIN q ON (t.sym = q.sym) AND " +
      "graft_asof_match_inner_strict(t.ts, q.ts)", gt)
    val lt = AsOfSqlRewrite(
      "SELECT * FROM t ASOF LEFT JOIN q ON t.sym = q.sym " +
        "MATCH_CONDITION (q.ts < t.ts) TIEBREAK (q.seq)")
    assert(lt == "SELECT * FROM t LEFT JOIN q ON (t.sym = q.sym) AND " +
      "graft_asof_match_strict(t.ts, q.ts, q.seq)", lt)
  }

  test("rewrite: the ON-conjunct form (DuckDB/ClickHouse spelling) maps without MATCH_CONDITION") {
    // Inequality last, >= — the canonical DuckDB/ClickHouse shape.
    val out = AsOfSqlRewrite(
      "SELECT * FROM t ASOF JOIN q ON t.sym = q.sym AND t.ts >= q.ts WHERE t.x = 1")
    assert(out == "SELECT * FROM t LEFT JOIN q ON (t.sym = q.sym\n) AND " +
      "graft_asof_match_inner(t.ts\n, q.ts\n)\nWHERE t.x = 1", out)
    // Inequality FIRST among the conjuncts, strict <, LEFT form: sides
    // swap (greater side is the probe time) and keys keep their order.
    val lt = AsOfSqlRewrite(
      "SELECT * FROM t ASOF LEFT JOIN q ON q.ts < t.ts AND t.sym = q.sym AND t.k2 = q.k2")
    assert(lt == "SELECT * FROM t LEFT JOIN q ON (t.sym = q.sym\n) AND " +
      "(t.k2 = q.k2\n) AND graft_asof_match_strict(t.ts\n, q.ts\n)\n", lt)
    // BETWEEN's AND belongs to the BETWEEN, not the conjunct split.
    val btw = AsOfSqlRewrite(
      "SELECT * FROM t ASOF JOIN q ON t.sym = q.sym AND q.b BETWEEN 1 AND 5 AND t.ts >= q.ts")
    assert(btw.contains("(q.b BETWEEN 1 AND 5\n) AND graft_asof_match_inner(t.ts\n, q.ts\n)"), btw)
    // LEFT the function is not LEFT the join introducer: the ON clause
    // scan must not end at `left(...)`.
    val fn = AsOfSqlRewrite(
      "SELECT * FROM t ASOF JOIN q ON left(t.sym, 2) = left(q.sym, 2) AND t.ts >= q.ts")
    assert(fn.contains("ON (left(t.sym, 2) = left(q.sym, 2)\n) AND graft_asof_match_inner"), fn)
  }

  test("rewrite: ON-conjunct named errors — no inequality, two inequalities, OR, no keys, USING") {
    val e0 = intercept[IllegalArgumentException](AsOfSqlRewrite(
      "SELECT * FROM t ASOF JOIN q ON t.sym = q.sym"))
    assert(e0.getMessage.contains("ON conjunct"), e0.getMessage)
    val e2 = intercept[IllegalArgumentException](AsOfSqlRewrite(
      "SELECT * FROM t ASOF JOIN q ON t.sym = q.sym AND t.ts >= q.ts AND t.v > q.v"))
    assert(e2.getMessage.contains("exactly ONE"), e2.getMessage)
    val eOr = intercept[IllegalArgumentException](AsOfSqlRewrite(
      "SELECT * FROM t ASOF JOIN q ON t.sym = q.sym OR t.ts >= q.ts"))
    assert(eOr.getMessage.contains("OR"), eOr.getMessage)
    val eKeys = intercept[IllegalArgumentException](AsOfSqlRewrite(
      "SELECT * FROM t ASOF JOIN q ON t.ts >= q.ts"))
    assert(eKeys.getMessage.contains("equality key"), eKeys.getMessage)
    val eUsing = intercept[IllegalArgumentException](AsOfSqlRewrite(
      "SELECT * FROM t ASOF JOIN q USING (sym, ts)"))
    assert(eUsing.getMessage.contains("USING"), eUsing.getMessage)
  }

  test("rewrite: missing MATCH_CONDITION or ON errors with an actionable message") {
    val e1 = intercept[IllegalArgumentException](AsOfSqlRewrite(
      "SELECT * FROM t ASOF JOIN q ON t.sym = q.sym"))
    assert(e1.getMessage.contains("MATCH_CONDITION"))
    val e2 = intercept[IllegalArgumentException](AsOfSqlRewrite(
      "SELECT * FROM t ASOF JOIN q"))
    assert(e2.getMessage.contains("ON clause"))
  }

  // ---- fixture for the execution paths ----

  private def fixture(s: SparkSession): Unit = {
    import s.implicits._
    Seq((0L, "A", 0L), (1L, "A", 1L), (2L, "A", 6L), (3L, "B", 3L), (4L, "C", 9L))
      .toDF("trade_id", "sym", "tts").createOrReplaceTempView("trades")
    // Two quotes at (A, 5): TIEBREAK(seq) must pick seq 21 (px 13).
    Seq(("A", 1L, 10L, 20L), ("A", 5L, 11L, 21L), ("A", 5L, 13L, 21L - 1L + 2L),
      ("B", 2L, 7L, 30L))
      .toDF("qsym", "qts", "px", "seq").createOrReplaceTempView("quotes")
  }

  // Expected backward matches (ties by max seq): trade 0 → none,
  // 1 → (A,1,10), 2 → (A,5,13,seq22), 3 → (B,2,7), 4 → none.

  test("AsOf.sql on a vanilla session plans AsOfJoinExec; inner drops unmatched; tiebreak picks max") {
    fixture(spark)
    val q =
      """SELECT trade_id, px FROM trades ASOF JOIN quotes
        |ON sym = qsym MATCH_CONDITION (tts >= qts) TIEBREAK (seq)
        |""".stripMargin
    val df = org.apache.spark.sql.graft.AsOf.sql(spark, q)
    // Physical tree strings strip the "Exec" suffix: "AsOfJoin [keys]…".
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin ["),
      df.queryExecution.executedPlan.toString)
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 10L, 2L -> 13L, 3L -> 7L), got.toString)
  }

  test("AsOf.sql: ASOF LEFT JOIN keeps unmatched trades with null quotes") {
    fixture(spark)
    val df = org.apache.spark.sql.graft.AsOf.sql(spark,
      """SELECT trade_id, px FROM trades ASOF LEFT JOIN quotes
        |ON sym = qsym MATCH_CONDITION (tts >= qts) TIEBREAK (seq)""".stripMargin)
    val got = df.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(0L -> -1L, 1L -> 10L, 2L -> 13L, 3L -> 7L, 4L -> -1L), got.toString)
    // Left ≡ the DataFrame API on the same inputs.
    val api = org.apache.spark.sql.graft.AsOf.asofJoin(
      spark.table("trades"), spark.table("quotes"),
      Seq("sym"), Seq("qsym"), "tts", "qts", Seq("seq"))
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(api == got, s"SQL $got vs API $api")
  }

  test("AsOf.sql composes with the full SQL language around the clause") {
    fixture(spark)
    val df = org.apache.spark.sql.graft.AsOf.sql(spark,
      """WITH big AS (SELECT * FROM trades WHERE tts >= 1)
        |SELECT sym, count(*) AS n, sum(px) AS total
        |FROM big ASOF JOIN quotes ON sym = qsym
        |MATCH_CONDITION (tts >= qts) TIEBREAK (seq)
        |GROUP BY sym ORDER BY sym""".stripMargin)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("A", 2L, 23L), ("B", 1L, 7L)), got.toString)
  }

  test("AsOf.sql strict: equal-time quotes are excluded, strictly-prior match wins") {
    fixture(spark)
    // Trade 1 (A, tts=1) matches quote (A,1) under >= but has NO strictly
    // prior quote — under > it must drop (inner). Trade 2 (A,6) still
    // takes the tiebreak-max (A,5) quote; trade 3 (B,3) takes (B,2).
    val df = org.apache.spark.sql.graft.AsOf.sql(spark,
      """SELECT trade_id, px FROM trades ASOF JOIN quotes
        |ON sym = qsym MATCH_CONDITION (tts > qts) TIEBREAK (seq)""".stripMargin)
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin ["),
      df.queryExecution.executedPlan.toString)
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 13L, 3L -> 7L), got.toString)
    // Strict LEFT form keeps the unmatched trades with nulls, and the
    // DataFrame API's strict flag computes the same relation.
    val sqlLeft = org.apache.spark.sql.graft.AsOf.sql(spark,
      """SELECT trade_id, px FROM trades ASOF LEFT JOIN quotes
        |ON sym = qsym MATCH_CONDITION (qts < tts) TIEBREAK (seq)""".stripMargin)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(sqlLeft == Map(0L -> -1L, 1L -> -1L, 2L -> 13L, 3L -> 7L, 4L -> -1L),
      sqlLeft.toString)
    val api = org.apache.spark.sql.graft.AsOf.asofJoin(
      spark.table("trades"), spark.table("quotes"),
      Seq("sym"), Seq("qsym"), "tts", "qts", Seq("seq"), strict = true)
      .select("trade_id", "px").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(api == sqlLeft, s"SQL $sqlLeft vs API $api")
  }

  test("AsOf.sql error paths: forward as-of, missing equi-key, non-equality conjunct") {
    fixture(spark)
    val fwd = intercept[IllegalArgumentException](org.apache.spark.sql.graft.AsOf.sql(spark,
      "SELECT * FROM trades ASOF JOIN quotes ON sym = qsym " +
        "MATCH_CONDITION (qts >= tts)").collect())
    assert(fwd.getMessage.contains("forward as-of"), fwd.getMessage)
    // The strict form rejects a forward request the same way.
    val fwdStrict = intercept[IllegalArgumentException](org.apache.spark.sql.graft.AsOf.sql(spark,
      "SELECT * FROM trades ASOF JOIN quotes ON sym = qsym " +
        "MATCH_CONDITION (qts > tts)").collect())
    assert(fwdStrict.getMessage.contains("forward as-of"), fwdStrict.getMessage)
    val nokey = intercept[IllegalArgumentException](org.apache.spark.sql.graft.AsOf.sql(spark,
      "SELECT * FROM trades ASOF JOIN quotes ON trade_id > seq " +
        "MATCH_CONDITION (tts >= qts)").collect())
    assert(nokey.getMessage.contains("cannot use"), nokey.getMessage)
  }

  test("hand-written marker form works without the custom syntax") {
    fixture(spark)
    val df = org.apache.spark.sql.graft.AsOf.sql(spark,
      "SELECT trade_id, px FROM trades LEFT JOIN quotes ON sym = qsym " +
        "AND graft_asof_match(tts, qts, seq)")
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin ["))
    assert(df.count() == 5)
  }

  test("interval marker: plain INNER JOIN SQL plans the native sweep and matches brute force") {
    fixture(spark)
    val df = org.apache.spark.sql.graft.AsOf.sql(spark,
      "SELECT trade_id, px FROM trades JOIN quotes ON sym = qsym " +
        "AND graft_interval_match(tts, qts, -2, 2)")
    assert(df.queryExecution.executedPlan.toString.contains("IntervalJoin ["),
      df.queryExecution.executedPlan.toString)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Window [t-2, t+2]: trade 0 (A,0) and 1 (A,1) reach quote (A,1,10);
    // trade 2 (A,6) reaches BOTH (A,5) quotes; trade 3 (B,3) reaches
    // (B,2,7); trade 4 (C,9) reaches nothing (inner: absent).
    assert(got == Set((0L, 10L), (1L, 10L), (2L, 11L), (2L, 13L), (3L, 7L)), got.toString)
    // Validation: empty window, unsupported join type (LEFT is supported
    // since the left-outer form landed; FULL is not).
    val e1 = intercept[IllegalArgumentException](org.apache.spark.sql.graft.AsOf.sql(spark,
      "SELECT * FROM trades JOIN quotes ON sym = qsym " +
        "AND graft_interval_match(tts, qts, 2, -2)").collect())
    assert(e1.getMessage.contains("empty"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](org.apache.spark.sql.graft.AsOf.sql(spark,
      "SELECT * FROM trades FULL OUTER JOIN quotes ON sym = qsym " +
        "AND graft_interval_match(tts, qts, -2, 2)").collect())
    assert(e2.getMessage.contains("INNER and LEFT"), e2.getMessage)
  }

  test("interval marker: LEFT JOIN keeps windowless trades with null quotes") {
    fixture(spark)
    val df = org.apache.spark.sql.graft.AsOf.sql(spark,
      "SELECT trade_id, px FROM trades LEFT JOIN quotes ON sym = qsym " +
        "AND graft_interval_match(tts, qts, -2, 2)")
    assert(df.queryExecution.executedPlan.toString.contains("IntervalJoin ["),
      df.queryExecution.executedPlan.toString)
    val got = df.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    // Trade 4 (C,9) has no C quotes: exactly one null-extended row. All
    // matched trades carry the same pairs as the inner form.
    assert(got == Map(0L -> Seq(10L), 1L -> Seq(10L), 2L -> Seq(11L, 13L),
      3L -> Seq(7L), 4L -> Seq(-1L)), got.toString)
    // ≡ the DataFrame API's left-outer flag on the same inputs.
    val q = spark.table("quotes")
    val api = org.apache.spark.sql.graft.Interval.intervalJoin(
      spark.table("trades"), q, Seq("sym"), Seq("qsym"), "tts", "qts",
      -2L, 2L, isInner = false)
      .select("trade_id", "px").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(api == got, s"SQL $got vs API $api")
  }

  test("injected parser: plain spark.sql understands ASOF JOIN in an extensions session") {
    val prior = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      fixture(s)
      val df = s.sql(
        """SELECT trade_id, px FROM trades ASOF JOIN quotes
          |ON sym = qsym MATCH_CONDITION (tts >= qts) TIEBREAK (seq)""".stripMargin)
      assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin ["),
        df.queryExecution.executedPlan.toString)
      assert(df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
        Map(1L -> 10L, 2L -> 13L, 3L -> 7L))
      // extraStrategies stays empty: the strategy arrived via the
      // extensions, not the per-call fallback (ExtensionsSpec contract).
      assert(s.experimental.extraStrategies.isEmpty)
      // ASOF JOIN inside a CREATE TEMP VIEW definition: the rewrite runs
      // on the DDL text, the view stores the marked plan, and querying the
      // view plans the native exec.
      s.sql(
        """CREATE OR REPLACE TEMPORARY VIEW last_px AS
          |SELECT trade_id, px FROM trades ASOF JOIN quotes
          |ON sym = qsym MATCH_CONDITION (tts >= qts) TIEBREAK (seq)""".stripMargin)
      val viaView = s.sql("SELECT trade_id, px FROM last_px WHERE px > 7")
      assert(viaView.queryExecution.executedPlan.toString.contains("AsOfJoin ["),
        viaView.queryExecution.executedPlan.toString)
      assert(viaView.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
        Map(1L -> 10L, 2L -> 13L))
      // ASOF JOIN nested inside a subquery relation: the balanced-paren
      // scan keeps the clause rewrite local to its own scope.
      val nested = s.sql(
        """SELECT sum(px) AS total FROM (
          |  SELECT trade_id, px FROM trades ASOF JOIN quotes
          |  ON sym = qsym MATCH_CONDITION (tts >= qts) TIEBREAK (seq)
          |) m WHERE trade_id <> 3""".stripMargin)
      assert(nested.queryExecution.executedPlan.toString.contains("AsOfJoin ["),
        nested.queryExecution.executedPlan.toString)
      assert(nested.collect().head.getLong(0) == 23L)
      // A broken STANDARD statement containing a depth-0 dialect trigger
      // word (a column named `settings`) trips the parse-failure gate,
      // and the dialect-rewritten text fails to parse too: the user must
      // get the error for THEIR statement, with the rewritten-parse
      // failure attached as suppressed — not a mangled-rewrite error.
      val broken = intercept[org.apache.spark.sql.catalyst.parser.ParseException](
        s.sql("SELECT settings, x FROM t WHERE (a = 1"))
      assert(broken.getMessage.contains("SELECT settings, x FROM t WHERE (a = 1"),
        s"must be the ORIGINAL statement's parse error:\n${broken.getMessage}")
      assert(broken.getSuppressed.exists(
        _.isInstanceOf[org.apache.spark.sql.AnalysisException]),
        "the rewritten-parse failure must ride along as suppressed")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setActiveSession)
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
