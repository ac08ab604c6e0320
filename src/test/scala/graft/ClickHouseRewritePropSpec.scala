package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.plans.ClickHouseSqlRewrite

/** Property sweep over the dialect rewriter's INERTNESS contract
  * (SURVEY §dialect; r10 verdict ask #8): text that merely LOOKS
  * ClickHouse-ish — backticked identifiers spelling the clause keywords
  * (`` `qualify` ``/`` `prewhere` ``/`` `settings` `` — the dialect's
  * own spelling for a column shadowing a clause word, mask-protected),
  * bare identifiers of the non-clause trigger words (`fill`, `global`,
  * `topk`, `quantile`, `asof`, `sample`, `totals`), string literals
  * containing `LIMIT 3 BY` or a funnel pattern, nested parens, comments
  * carrying dialect keywords — must pass through `eq`-SAME (the
  * fixpoint may not churn text). The example-based pins in
  * `ClickHouseSqlSpec` cover known corners; this generates the corpus.
  *
  * Deliberately EXCLUDED: BARE `qualify`/`prewhere`/`settings`/`format`
  * in clause-shaped positions — on the explicit-dialect path those ARE
  * the clauses (the rewriter must treat them so), and in an extensions
  * session standard SQL containing them parses cleanly stock and never
  * reaches the rewriter at all (the parse-failure gate + the
  * original-error-with-suppressed rethrow in `GraftSqlParser`). Also
  * excluded since r13: bracket INDEXING (`arr[1]`) — on the explicit
  * dialect path that IS ClickHouse's 1-based subscript and must
  * rewrite (covered by the dialect-statement generator below); the
  * extensions session keeps Spark's 0-based form via the same gate.
  */
object ClickHouseRewritePropSpec extends Properties("ClickHouseRewrite") {

  // Identifiers that spell dialect trigger words but sit in ordinary
  // identifier positions: clause keywords ride backticks (the masked,
  // dialect-legal spelling); non-clause triggers go bare.
  private val trickyIdent = Gen.oneOf(
    "`qualify`", "`prewhere`", "`settings`", "fill", "global", "topk",
    "quantile", "windowfunnel", "asof", "sample", "totals", "final",
    "interpolate", "transform", "dictget", "toweek", "position", "apply",
    "`except`", "replace", "geohashencode", "sparkbar", "ngramdistance",
    "exponentialmovingaverage", "a", "b", "k", "v")

  private val trickyLiteral = Gen.oneOf(
    "'LIMIT 3 BY u'", "'QUALIFY rn <= 2'", "'PREWHERE x'",
    "'ARRAY JOIN arr AS t'", "'(?1).*(?2)'", "'SETTINGS max_threads = 4'",
    "'ORDER BY d WITH FILL STEP 2'", "'GROUP BY k WITH TOTALS'",
    "'windowFunnel(60)(ts, a)'", "'it''s'")

  private val selectItem: Gen[String] = Gen.oneOf(
    trickyIdent,
    trickyLiteral.map(l => s"$l AS s"),
    trickyIdent.map(i => s"sum($i)"),
    trickyIdent.map(i => s"count(*) FILTER (WHERE $i > 0)"),
    Gen.zip(trickyIdent, trickyIdent).map { case (x, y) => s"($x + ($y * 2))" },
    trickyIdent.map(i => s"row_number() OVER (PARTITION BY $i ORDER BY $i)"))

  private val comment = Gen.oneOf(
    "", " -- LIMIT 2 BY u QUALIFY\n", " /* PREWHERE SETTINGS */ ")

  private val standardStmt: Gen[String] = for {
    items <- Gen.nonEmptyListOf(selectItem).map(_.take(4))
    tbl <- trickyIdent
    cmt <- comment
    where <- Gen.option(trickyIdent.map(i => s" WHERE $i = 1"))
    group <- Gen.option(trickyIdent.map(i => s" GROUP BY $i"))
    order <- Gen.option(trickyIdent.map(i => s" ORDER BY $i DESC"))
    limit <- Gen.option(Gen.choose(1, 99).map(n => s" LIMIT $n"))
    nest <- Gen.oneOf(true, false)
  } yield {
    val from = if (nest) s"(SELECT * FROM $tbl$cmt)" else tbl
    s"SELECT ${items.mkString(", ")} FROM $from" +
      where.getOrElse("") + group.getOrElse("") +
      order.getOrElse("") + limit.getOrElse("")
  }

  property("standard SQL with dialect-lookalike identifiers/literals is eq-inert") =
    forAll(standardStmt) { s => ClickHouseSqlRewrite(s) eq s }

  // Idempotence over GENERATED dialect statements: one pass rewrites,
  // a second pass over the output is an eq-no-op (the fixpoint
  // converged and converged text is standard SQL).
  private val chStmt: Gen[String] = Gen.oneOf(
    Gen.zip(trickyIdent, Gen.choose(1, 9)).map { case (i, n) =>
      s"SELECT u, $i FROM t ORDER BY $i LIMIT $n BY u" },
    Gen.zip(Gen.choose(0, 9), Gen.choose(1, 9)).map { case (o, n) =>
      s"SELECT u, v FROM t ORDER BY v LIMIT $o, $n BY u" },
    trickyIdent.map(i =>
      s"SELECT k, max($i) OVER (PARTITION BY k) AS m FROM t QUALIFY m > 1"),
    Gen.choose(1, 9).map(n =>
      s"SELECT quantileExact(0.$n)(x), topK($n)(y) FROM t GROUP BY k"),
    Gen.choose(1, 9).map(n =>
      s"SELECT quantileExactWeighted(0.$n)(x, w), quantileExactLow(0.$n)(x), " +
        s"uniqUpTo($n)(y) FROM t GROUP BY k"),
    Gen.choose(1, 999).map(w =>
      s"SELECT windowFunnel($w, 'strict_order')(ts, a, b) FROM t GROUP BY u"),
    Gen.choose(1, 999).map(w =>
      s"SELECT sequenceMatch('(?1).*(?t<=$w)(?2)')(ts, a, b) FROM t GROUP BY u"),
    trickyIdent.map(i => s"SELECT $i FROM t PREWHERE k = 1 WHERE v > 2"),
    // Bare position() carries ClickHouse's haystack-first order via the
    // textual rename; the standard position(needle IN haystack) form is
    // pinned inert in ClickHouseSqlSpec.
    trickyIdent.map(i => s"SELECT position($i, 'ab') FROM t WHERE k = 1"),
    Gen.zip(Gen.choose(1, 9), Gen.choose(1, 9)).map { case (a, b) =>
      s"SELECT groupArrayMovingSum($a)(v), groupArrayMovingAvg($b)(v) FROM t GROUP BY u" },
    // r13 spellings: EMA rewrites to its own 3-arg registry name (the
    // second pass must see the flattened call as standard SQL), sparkbar
    // to graft_ch_sparkbar in both the 1- and 3-parameter forms.
    Gen.choose(1, 999).map(x =>
      s"SELECT exponentialMovingAverage($x)(v, t) FROM t GROUP BY u"),
    Gen.choose(2, 99).map(n =>
      s"SELECT sparkbar($n)(x, y) FROM t GROUP BY u"),
    Gen.zip(Gen.choose(2, 99), Gen.choose(1, 12)).map { case (n, m) =>
      s"SELECT sparkbar($n, 1, $m)(x, y) FROM t GROUP BY u" },
    // Bracket indexing (r13): plain, chained, call-result, and
    // negative-index forms all rewrite to graft_ch_element and reach
    // fixpoint (the rewrite emits no brackets of its own).
    Gen.zip(trickyIdent, Gen.choose(-9, 9).suchThat(_ != 0)).map {
      case (a, n) => s"SELECT $a[$n] FROM t" },
    Gen.choose(1, 9).map(n => s"SELECT split(s, ',')[$n][1] FROM t"),
    // dateAdd/dateSub unit-first renames (r13): bare and quoted units.
    Gen.oneOf("day", "hour", "month", "'week'", "'minute'").flatMap(u =>
      Gen.choose(1, 99).map(n => s"SELECT dateAdd($u, $n, ts) FROM t")),
    Gen.choose(1, 99).map(n => s"SELECT dateSub(year, $n, d) FROM t GROUP BY k"))

  property("generated dialect statements rewrite once, then fixpoint") =
    forAll(chStmt) { s =>
      val once = ClickHouseSqlRewrite(s)
      (once ne s) && (ClickHouseSqlRewrite(once) eq once)
    }
}
