package graft

import graft.plans.{ClickHouseSql, ClickHouseSqlRewrite}

/** The ClickHouse SQL dialect compat layer ([[graft.plans.ClickHouseSqlRewrite]]
  * + [[graft.plans.ClickHouseFunctions]]): the text-rewrite kernel, the
  * vanilla-session `ClickHouseSql.sql` entry, the named error paths, and
  * the exact-semantics pins for the function mappings the DuckDB oracle
  * cannot cover (approx `uniq`, the plural `quantiles*` array forms,
  * ClickHouse's 0-not-NULL empty-match `sumIf`).
  */
class ClickHouseSqlSpec extends SparkSpec {
  import spark.implicits._

  // ---- text-rewrite kernel (no Spark involved) ----

  test("rewrite: LIMIT n BY becomes a row_number filter with the sort re-applied") {
    val out = ClickHouseSqlRewrite(
      "SELECT u, v FROM t ORDER BY u, v DESC LIMIT 2 BY u")
    assert(out == "SELECT * EXCEPT (__graft_limit_by_rn) FROM (SELECT *, " +
      "row_number() OVER (PARTITION BY u ORDER BY u, v DESC) AS __graft_limit_by_rn " +
      "FROM (SELECT u, v FROM t)) WHERE __graft_limit_by_rn <= 2 ORDER BY u, v DESC ", out)
  }

  test("rewrite: LIMIT BY keeps a trailing plain LIMIT and composite keys") {
    val out = ClickHouseSqlRewrite(
      "SELECT a, b, c FROM t ORDER BY c LIMIT 3 BY a, b LIMIT 10")
    assert(out.contains("PARTITION BY a, b ORDER BY c"), out)
    assert(out.contains("__graft_limit_by_rn <= 3 ORDER BY c LIMIT 10"), out)
  }

  test("rewrite: QUALIFY wraps the select and star-EXCEPTs the predicate back out") {
    val out = ClickHouseSqlRewrite(
      "SELECT k, row_number() OVER (PARTITION BY k ORDER BY v) AS rn FROM t " +
        "QUALIFY rn <= 2 ORDER BY k, rn")
    assert(out == "SELECT * EXCEPT (__graft_qualify) FROM (SELECT k, " +
      "row_number() OVER (PARTITION BY k ORDER BY v) AS rn, (rn <= 2) AS __graft_qualify " +
      "FROM t) WHERE __graft_qualify ORDER BY k, rn", out)
  }

  test("rewrite: QUALIFY in a subquery rewrites only that scope") {
    val out = ClickHouseSqlRewrite(
      "SELECT * FROM (SELECT k, max(v) OVER (PARTITION BY k) AS m FROM t QUALIFY m > 1) q " +
        "WHERE k < 10")
    assert(out.startsWith("SELECT * FROM (SELECT * EXCEPT (__graft_qualify) FROM (SELECT k, "), out)
    assert(out.endsWith(") WHERE __graft_qualify ) q WHERE k < 10"), out)
  }

  test("rewrite: quantile call syntax maps exact/approx and plural/array forms") {
    assert(ClickHouseSqlRewrite("SELECT quantileExact(0.5)(x) FROM t")
      == "SELECT percentile(x, 0.5) FROM t")
    assert(ClickHouseSqlRewrite("SELECT quantile(0.9)(x) FROM t")
      == "SELECT approx_percentile(x, 0.9) FROM t")
    assert(ClickHouseSqlRewrite("SELECT quantilesExact(0.5, 0.9)(x) FROM t")
      == "SELECT percentile(x, array(0.5, 0.9)) FROM t")
    assert(ClickHouseSqlRewrite("SELECT quantiles(0.5, 0.9)(x) FROM t")
      == "SELECT approx_percentile(x, array(0.5, 0.9)) FROM t")
  }

  test("rewrite: uniqExact/uniq map to count-distinct/approx; multi-arg uniq structs") {
    assert(ClickHouseSqlRewrite("SELECT uniqExact(a, b) FROM t")
      == "SELECT count(DISTINCT a, b) FROM t")
    assert(ClickHouseSqlRewrite("SELECT uniq(a) FROM t")
      == "SELECT approx_count_distinct(a) FROM t")
    assert(ClickHouseSqlRewrite("SELECT uniq(a, b) FROM t")
      == "SELECT approx_count_distinct(struct(a, b)) FROM t")
  }

  test("rewrite: PREWHERE merges into WHERE; standalone PREWHERE becomes WHERE") {
    val merged = ClickHouseSqlRewrite(
      "SELECT a FROM t PREWHERE k = 1 WHERE v > 2 GROUP BY a ORDER BY a")
    assert(merged == "SELECT a FROM t WHERE (k = 1) AND (v > 2) GROUP BY a ORDER BY a", merged)
    val alone = ClickHouseSqlRewrite(
      "SELECT a FROM t PREWHERE k = 1 GROUP BY a")
    assert(alone == "SELECT a FROM t WHERE k = 1 GROUP BY a", alone)
  }

  test("rewrite: string literals and comments are inert; non-CH SQL is untouched") {
    val lit = "SELECT 'LIMIT 2 BY u QUALIFY uniq(x)' AS s FROM t ORDER BY s"
    assert(ClickHouseSqlRewrite(lit) eq lit, "literal must not be rewritten")
    val cmt = "SELECT a FROM t -- QUALIFY rn = 1\nORDER BY a"
    assert(ClickHouseSqlRewrite(cmt) eq cmt, "comment must not be rewritten")
    val plain = "SELECT a, count(*) FROM t GROUP BY a ORDER BY a LIMIT 5"
    assert(ClickHouseSqlRewrite(plain) eq plain, "plain SQL must pass through untouched")
  }

  test("rewrite: named errors — unordered LIMIT BY, offset form, ordinals, DISTINCT, unions") {
    val e1 = intercept[IllegalArgumentException](ClickHouseSqlRewrite(
      "SELECT u, v FROM t LIMIT 2 BY u"))
    assert(e1.getMessage.contains("requires an ORDER BY"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](ClickHouseSqlRewrite(
      "SELECT u, v FROM t ORDER BY v LIMIT 1, 2 BY u"))
    assert(e2.getMessage.contains("offset"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](ClickHouseSqlRewrite(
      "SELECT u, v FROM t ORDER BY 2 LIMIT 2 BY u"))
    assert(e3.getMessage.contains("ordinal"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException](ClickHouseSqlRewrite(
      "SELECT DISTINCT u, rank() OVER (ORDER BY u) AS r FROM t QUALIFY r < 3"))
    assert(e4.getMessage.contains("DISTINCT"), e4.getMessage)
    val e5 = intercept[IllegalArgumentException](ClickHouseSqlRewrite(
      "SELECT u, v FROM a UNION ALL SELECT u, v FROM b ORDER BY v LIMIT 2 BY u"))
    assert(e5.getMessage.contains("set operation"), e5.getMessage)
  }

  // ---- execution through the vanilla-session entry ----

  private def fixture(): Unit =
    Seq((1L, "x", 10L), (1L, "y", 20L), (1L, "z", 30L), (2L, "p", 5L), (2L, "q", 50L))
      .toDF("k", "s", "v").createOrReplaceTempView("chf")

  test("execution: LIMIT BY keeps the first n per group of the ordered stream") {
    fixture()
    val rows = ClickHouseSql.sql(spark,
      "SELECT k, s, v FROM chf ORDER BY k, v DESC LIMIT 2 BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "z", 30L), (1L, "y", 20L), (2L, "q", 50L), (2L, "p", 5L)), rows)
  }

  test("execution: QUALIFY filters on a window alias; schema has no helper column") {
    fixture()
    val df = ClickHouseSql.sql(spark,
      """SELECT k, s, CAST(row_number() OVER (PARTITION BY k ORDER BY v DESC, s) AS BIGINT) AS rn
        |FROM chf QUALIFY rn = 1 ORDER BY k""".stripMargin)
    assert(df.columns.toSeq == Seq("k", "s", "rn"), df.columns.toSeq)
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "z", 1L), (2L, "q", 1L)), rows)
  }

  test("execution: sumIf returns ClickHouse's 0 (not NULL) when no row matches") {
    fixture()
    val r = ClickHouseSql.sql(spark,
      "SELECT k, sumIf(v, s = 'nope') AS z FROM chf GROUP BY k ORDER BY k").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(0L, 0L), r.mkString(","))
  }

  test("execution: countIf excludes null-condition rows; multiIf chains; has matches") {
    fixture()
    val r = ClickHouseSql.sql(spark,
      """SELECT countIf(v > 15) AS c,
        |       multiIf(count(*) = 5, 'five', count(*) = 4, 'four', 'other') AS m,
        |       countIf(has(array(s, 'w'), 'x')) AS hx
        |FROM chf""".stripMargin).head()
    assert((r.getLong(0), r.getString(1), r.getLong(2)) == ((3L, "five", 1L)), r)
  }

  test("execution: conversion functions cast exactly") {
    val r = ClickHouseSql.sql(spark,
      """SELECT toInt64('42') AS a, toInt32(7.0) AS b, toUInt64(9) AS c,
        |       toString(DATE'2024-02-29') AS d, toFloat64('2.5') AS e""".stripMargin).head()
    assert(r.getLong(0) == 42L && r.getInt(1) == 7 &&
      r.getDecimal(2).longValueExact() == 9L &&
      r.getString(3) == "2024-02-29" && r.getDouble(4) == 2.5, r)
  }

  test("execution: date bucketing functions agree with hand-computed anchors") {
    val r = ClickHouseSql.sql(spark,
      """SELECT toYYYYMM(TIMESTAMP'2024-02-29 13:45:12') AS ym,
        |       toYYYYMMDD(TIMESTAMP'2024-02-29 13:45:12') AS ymd,
        |       toYear(TIMESTAMP'2024-02-29 13:45:12') AS y,
        |       toDayOfMonth(TIMESTAMP'2024-02-29 13:45:12') AS d,
        |       toHour(TIMESTAMP'2024-02-29 13:45:12') AS h,
        |       toString(toStartOfMonth(TIMESTAMP'2024-02-29 13:45:12')) AS som,
        |       toString(toStartOfQuarter(TIMESTAMP'2024-02-29 13:45:12')) AS soq,
        |       toString(toStartOfDay(TIMESTAMP'2024-02-29 13:45:12')) AS sod,
        |       toUnixTimestamp(TIMESTAMP'1970-01-02 00:00:00') AS us""".stripMargin).head()
    assert(r.getInt(0) == 202402 && r.getInt(1) == 20240229 &&
      r.getInt(2) == 2024 && r.getInt(3) == 29 && r.getInt(4) == 13, r)
    assert(r.getString(5) == "2024-02-01" && r.getString(6) == "2024-01-01" &&
      r.getString(7) == "2024-02-29 00:00:00", r)
    assert(r.getLong(8) == 86400L, r)
  }

  test("execution: uniq tracks approx_count_distinct exactly (same sketch)") {
    fixture()
    val a = ClickHouseSql.sql(spark, "SELECT uniq(s) FROM chf").head().getLong(0)
    val b = spark.sql("SELECT approx_count_distinct(s) FROM chf").head().getLong(0)
    assert(a == b, s"uniq=$a approx=$b")
  }

  test("execution: plural quantilesExact equals the two singular percentiles") {
    fixture()
    val arr = ClickHouseSql.sql(spark,
      "SELECT quantilesExact(0.5, 0.9)(v) FROM chf").head().getSeq[Double](0)
    val p50 = spark.sql("SELECT percentile(v, 0.5) FROM chf").head().getDouble(0)
    val p90 = spark.sql("SELECT percentile(v, 0.9) FROM chf").head().getDouble(0)
    assert(arr == Seq(p50, p90), s"$arr vs ($p50, $p90)")
  }

  test("execution: a ported custom_query shape — LIMIT BY + QUALIFY + combinators together") {
    fixture()
    // The reference splices {query_filter} into custom_query bodies
    // (README.md:63); this is what such a body looks like after the
    // splice, exercising three dialect features in one statement.
    val df = ClickHouseSql.sql(spark,
      """SELECT k, s, v,
        |       CAST(row_number() OVER (PARTITION BY k ORDER BY v DESC, s) AS BIGINT) AS rn
        |FROM chf WHERE 1=1
        |QUALIFY rn <= 2
        |ORDER BY k, v DESC, s
        |LIMIT 1 BY k""".stripMargin)
    val rows = df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((1L, "z"), (2L, "q")), rows)
  }
}
