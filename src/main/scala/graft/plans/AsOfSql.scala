package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, PredicateHelper, Unevaluable}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StructType, TimestampNTZType, TimestampType}

/** SQL surface for the native as-of join ([[AsOfJoin]]): the `injectParser`
  * seam. Grammar — BOTH of the public dialect spellings:
  *
  * {{{
  * -- Snowflake/DuckDB MATCH_CONDITION form (TIEBREAK is this grammar's
  * -- determinism extension):
  * SELECT ... FROM l ASOF JOIN r        ON l.k = r.k [AND ...] MATCH_CONDITION (l.t >= r.t) [TIEBREAK (r.c, ...)]
  * SELECT ... FROM l ASOF LEFT JOIN r   ON ...                 MATCH_CONDITION (...)
  * -- DuckDB/ClickHouse ON-conjunct form: the inequality rides the ON
  * -- clause directly (both engines' native spelling):
  * SELECT ... FROM l ASOF JOIN r        ON l.k = r.k AND l.t >= r.t
  * SELECT ... FROM l ASOF LEFT JOIN r   ON l.t >= r.t AND l.k = r.k
  * }}}
  *
  * `ASOF JOIN` is INNER like DuckDB's and ClickHouse's (unmatched left
  * rows drop); `ASOF LEFT JOIN` keeps them with null right columns
  * (pandas `merge_asof`). The match condition accepts one
  * `>=`/`<=`/`>`/`<` comparison whose greater side must be the LEFT
  * time — backward as-of only, a forward request errors rather than
  * silently flipping direction. In the ON-conjunct form the clause is
  * split at depth-0 `AND`s (BETWEEN-aware) and must carry EXACTLY one
  * inequality conjunct plus at least one key equality — zero or several
  * inequalities, or a depth-0 `OR`, are named errors, never a guess.
  * The strict forms (`>`/`<`) match the latest STRICTLY-prior right
  * row, excluding equal-time rows — pandas
  * `merge_asof(allow_exact_matches=False)`. `TIEBREAK` names right-side
  * columns that break equal-time ties (max wins), making the match
  * total-order deterministic like the DataFrame API; it belongs to the
  * MATCH_CONDITION form (neither public dialect has tiebreaks in the
  * ON-conjunct spelling). `ASOF JOIN ... USING` is a named error — the
  * USING form hides which column carries the inequality.
  *
  * Mechanism — three pieces, each on a public extension seam:
  *
  *  1. [[GraftSqlParser]] (`injectParser`): rewrites the `ASOF JOIN`
  *     clause TEXTUALLY into a standard `LEFT JOIN` whose condition
  *     carries the [[AsOfMatch]] marker function, then delegates to
  *     Spark's own parser. The full SQL language keeps working —
  *     projections, WHERE, CTEs, nesting — because Spark parses the
  *     rewritten statement; only the one clause is transformed. String
  *     literals, quoted identifiers, and comments are masked before
  *     keyword scanning, and spans are balanced-paren scans (not greedy
  *     regexes), so `'ASOF JOIN'` in a literal or a subquery relation
  *     with its own ON never confuses the rewrite.
  *  2. [[AsOfMatch]] (`injectFunction` as `graft_asof_match` /
  *     `graft_asof_match_inner`): an Unevaluable boolean that anchors the
  *     as-of spec inside the join condition through analysis. It
  *     references both sides, so no optimizer rule can push it out of the
  *     condition; if it ever reached execution the failure is loud.
  *  3. [[ResolveAsOfSql]] (`injectResolutionRule`): converts the marked
  *     `Join` into the [[AsOfJoin]] logical node once both sides resolve,
  *     splitting the remaining conjuncts into per-position equi-keys with
  *     the same validation as the Scala API (`AsOf.asofJoin`). Output
  *     attribute ids are preserved, so references above the join are
  *     untouched.
  *
  * Hand-written SQL can also skip the custom syntax entirely:
  * `... LEFT JOIN r ON l.k = r.k AND graft_asof_match(l.t, r.t)` is the
  * post-rewrite form and works verbatim.
  */
case class AsOfMatch(children: Seq[Expression], inner: Boolean,
    strict: Boolean = false)
    extends Expression with Unevaluable {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length < 2)
      TypeCheckResult.TypeCheckFailure(
        "graft_asof_match needs (left_time, right_time[, tiebreaks...])")
    else {
      val ok: Set[DataType] = Set(LongType, TimestampType, TimestampNTZType)
      val bad = children.take(2).filterNot(c => ok.contains(c.dataType))
      if (bad.nonEmpty)
        TypeCheckResult.TypeCheckFailure(
          "as-of time columns must be BIGINT/TIMESTAMP/TIMESTAMP_NTZ, got " +
            bad.map(_.dataType.simpleString).mkString(", "))
      else TypeCheckResult.TypeCheckSuccess
    }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AsOfMatch = copy(children = newChildren)
}

/** Marker for the native KEYED INTERVAL JOIN ([[IntervalJoin]]) — the
  * hand-written-SQL form only (no custom grammar; the clause is already
  * plain SQL): `FROM l JOIN r ON l.k = r.k AND
  * graft_interval_match(l.t, r.t, lo_us, hi_us)` matches every same-key
  * pair with `r.t ∈ [l.t + lo_us, l.t + hi_us]` and plans as the
  * sorted-sweep [[IntervalJoinExec]] via [[ResolveAsOfSql]]; `LEFT JOIN`
  * with the same marker is the left-outer form (windowless left rows keep
  * null right columns). Bounds must be integer literals (they
  * parameterize the physical sweep).
  */
case class IntervalMatch(children: Seq[Expression])
    extends Expression with Unevaluable {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length != 4)
      TypeCheckResult.TypeCheckFailure(
        "graft_interval_match needs (left_time, right_time, lo_us, hi_us)")
    else {
      val ok: Set[DataType] = Set(LongType, TimestampType, TimestampNTZType)
      val badTime = children.take(2).filterNot(c => ok.contains(c.dataType))
      val badBound = children.drop(2).filterNot(c =>
        c.foldable && (c.dataType == LongType || c.dataType == org.apache.spark.sql.types.IntegerType))
      if (badTime.nonEmpty)
        TypeCheckResult.TypeCheckFailure(
          "interval time columns must be BIGINT/TIMESTAMP/TIMESTAMP_NTZ, got " +
            badTime.map(_.dataType.simpleString).mkString(", "))
      else if (badBound.nonEmpty)
        TypeCheckResult.TypeCheckFailure(
          "interval bounds must be INT/BIGINT literals, got " +
            badBound.map(_.sql).mkString(", "))
      else TypeCheckResult.TypeCheckSuccess
    }

  /** The folded [lo, hi] micros window. Only valid once resolved. */
  private[plans] def bounds: (Long, Long) = {
    def longOf(e: Expression): Long = e.eval() match {
      case i: java.lang.Integer => i.toLong
      case l: java.lang.Long => l
      case other => throw new IllegalArgumentException(
        s"interval bound ${e.sql} folded to $other, expected an integer")
    }
    (longOf(children(2)), longOf(children(3)))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): IntervalMatch = copy(children = newChildren)
}

/** Textual `ASOF JOIN` → marked `LEFT JOIN` rewrite. Pure string→string, no
  * session state — unit-testable without Spark.
  */
object AsOfSqlRewrite {

  def apply(sql: String): String = {
    var cur = sql
    var changed = true
    var guard = 0
    while (changed && guard < 64) {
      val next = rewriteOne(cur)
      changed = next ne cur
      cur = next
      guard += 1
    }
    cur
  }

  /** Blank out string literals ('…' and "…" with doubled-quote and
    * backslash escapes), backtick identifiers, `--` line comments, and
    * block comments, PRESERVING offsets, so keyword/paren scanning never
    * fires inside them. Capture-group slices always come from the ORIGINAL
    * text at the masked offsets.
    */
  private[plans] def mask(s: String): String = {
    val out = s.toCharArray
    def blank(from: Int, until: Int): Unit = {
      var j = from
      while (j < until && j < out.length) { out(j) = ' '; j += 1 }
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        var j = i + 1
        var end = -1
        while (j < s.length && end < 0) {
          if (s.charAt(j) == '\\' && c != '`') j += 2
          else if (s.charAt(j) == c) {
            if (j + 1 < s.length && s.charAt(j + 1) == c) j += 2 else end = j + 1
          } else j += 1
        }
        val stop = if (end < 0) s.length else end
        blank(i, stop); i = stop
      } else if (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-') {
        var j = i + 2
        while (j < s.length && s.charAt(j) != '\n') j += 1
        blank(i, j); i = j
      } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        val e = s.indexOf("*/", i + 2)
        val stop = if (e < 0) s.length else e + 2
        blank(i, stop); i = stop
      } else i += 1
    }
    new String(out)
  }

  private[plans] def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** First depth-0 occurrence of keyword `kw` in `masked` at or after
    * `from`; −1 if none before the enclosing scope closes (depth < 0).
    */
  private[plans] def findKeyword(masked: String, from: Int, kw: String): Int = {
    var i = from
    var depth = 0
    while (i < masked.length) {
      val c = masked.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth < 0) return -1 }
      else if (depth == 0 && masked.regionMatches(true, i, kw, 0, kw.length) &&
          (i == 0 || !isWordChar(masked.charAt(i - 1))) &&
          (i + kw.length >= masked.length || !isWordChar(masked.charAt(i + kw.length))))
        return i
      i += 1
    }
    -1
  }

  /** Span of the balanced-paren group whose '(' is the next non-space char
    * at or after `from`: (contentStart, contentEnd, afterCloseParen).
    */
  private[plans] def parenSpan(masked: String, from: Int): (Int, Int, Int) = {
    var i = from
    while (i < masked.length && masked.charAt(i).isWhitespace) i += 1
    if (i >= masked.length || masked.charAt(i) != '(')
      throw new IllegalArgumentException(
        s"as-of SQL: expected '(' at offset $i")
    var depth = 1
    var j = i + 1
    while (j < masked.length && depth > 0) {
      val c = masked.charAt(j)
      if (c == '(') depth += 1 else if (c == ')') depth -= 1
      j += 1
    }
    if (depth != 0) throw new IllegalArgumentException(
      "as-of SQL: unbalanced parentheses in MATCH_CONDITION/TIEBREAK")
    (i + 1, j - 1, j)
  }

  private val AsofRe = java.util.regex.Pattern.compile(
    "(?i)\\bASOF\\s+(?:(LEFT|INNER)\\s+)?JOIN\\b")

  /** One `>=`, `<=`, `>` or `<` at depth 0 inside [from, until):
    * (index, isGreater, isStrict, opLength); index −1 when none. The
    * greater side is the left (probe) time either way, and the one-char
    * strict forms (DuckDB also accepts them) exclude equal-time rows.
    * `<>` is skipped whole so it can't half-match as a strict `<`.
    */
  private def findTimeCmp(masked: String, from: Int,
      until: Int): (Int, Boolean, Boolean, Int) = {
    var cmpIdx = -1
    var cmpGe = true
    var cmpStrict = false
    var cmpLen = 2
    var depth = 0
    var i = from
    while (i < until && cmpIdx < 0) {
      val c = masked.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && (c == '>' || c == '<')) {
        val nxt = if (i + 1 < until) masked.charAt(i + 1) else ' '
        if (nxt == '=') { cmpIdx = i; cmpGe = c == '>'; cmpStrict = false; cmpLen = 2 }
        else if (c == '<' && nxt == '>') i += 1 // inequality, not a direction
        else { cmpIdx = i; cmpGe = c == '>'; cmpStrict = true; cmpLen = 1 }
      }
      i += 1
    }
    (cmpIdx, cmpGe, cmpStrict, cmpLen)
  }

  /** Clause keywords that end an ON expression at depth 0. Join
    * introducers (`LEFT`, `INNER`, `CROSS`, …) are NOT listed — `left`
    * is also a function and an identifier — they end the clause only
    * when [[JoinIntroRe]] confirms a JOIN follows.
    */
  private val OnEnders = Seq(
    "MATCH_CONDITION", "WHERE", "GROUP", "HAVING", "QUALIFY", "ORDER",
    "LIMIT", "OFFSET", "UNION", "INTERSECT", "EXCEPT", "WINDOW",
    "SETTINGS", "FORMAT", "USING")

  private val JoinIntroRe = java.util.regex.Pattern.compile(
    "(?i)(?:(?:GLOBAL|NATURAL|ANY|ALL|ASOF|SEMI|ANTI|INNER|LEFT|RIGHT|FULL|CROSS|OUTER)\\s+)*JOIN\\b")

  /** True when position `i` starts a join introducer (`JOIN`, or kind
    * words followed by `JOIN` — so `left(x, 2)` the function never
    * qualifies). The caller checks the word boundary before `i`.
    */
  private[plans] def isJoinIntro(masked: String, i: Int): Boolean = {
    val jm = JoinIntroRe.matcher(masked)
    jm.region(i, masked.length)
    jm.lookingAt()
  }

  /** End offset of the ON expression starting at `from`: the first
    * depth-0 ender keyword or join introducer at a word boundary (a `.`
    * before the word means a qualified name, not a keyword), a depth-0
    * comma, the ')' closing the enclosing scope, or end-of-string.
    */
  private def onClauseEnd(masked: String, from: Int): Int = {
    var i = from
    var depth = 0
    while (i < masked.length) {
      val c = masked.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth < 0) return i }
      else if (c == ',' && depth == 0) return i
      else if (depth == 0 && (i == 0 ||
          (!isWordChar(masked.charAt(i - 1)) && masked.charAt(i - 1) != '.'))) {
        if (OnEnders.exists(kw => masked.regionMatches(true, i, kw, 0, kw.length) &&
            (i + kw.length >= masked.length || !isWordChar(masked.charAt(i + kw.length)))))
          return i
        if (isJoinIntro(masked, i)) return i
      }
      i += 1
    }
    masked.length
  }

  /** Depth-0 conjunct split at `AND`, BETWEEN-aware (the `AND` inside
    * `x BETWEEN a AND b` belongs to the BETWEEN). A depth-0 `OR` is a
    * named error: an as-of ON clause must be a conjunction.
    */
  private def splitTopAnd(masked: String, from: Int, until: Int): Seq[(Int, Int)] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var start = from
    var depth = 0
    var pendingBetween = 0
    var i = from
    while (i < until) {
      val c = masked.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && (i == 0 || !isWordChar(masked.charAt(i - 1)))) {
        def word(kw: String): Boolean =
          masked.regionMatches(true, i, kw, 0, kw.length) &&
            (i + kw.length >= until || !isWordChar(masked.charAt(i + kw.length)))
        if (word("BETWEEN")) pendingBetween += 1
        else if (word("OR")) throw new IllegalArgumentException(
          "as-of SQL: ASOF JOIN's ON clause must be a conjunction (AND of " +
            "key equalities and one time inequality) — OR is not supported")
        else if (word("AND")) {
          if (pendingBetween > 0) pendingBetween -= 1
          else { parts += ((start, i)); start = i + 3 }
        }
      }
      i += 1
    }
    parts += ((start, until))
    parts.toSeq
  }

  private def rewriteOne(sql: String): String = {
    val masked = mask(sql)
    val m = AsofRe.matcher(masked)
    if (!m.find()) return sql
    val isLeft = m.group(1) != null && m.group(1).equalsIgnoreCase("LEFT")
    val onIdx = findKeyword(masked, m.end(), "ON")
    val usingIdx = findKeyword(masked, m.end(), "USING")
    if (usingIdx >= 0 && (onIdx < 0 || usingIdx < onIdx))
      throw new IllegalArgumentException(
        "as-of SQL: ASOF JOIN ... USING is not supported — the USING form " +
          "hides which column carries the inequality; spell the ON form " +
          "(ON l.k = r.k AND l.t >= r.t)")
    if (onIdx < 0) throw new IllegalArgumentException(
      "as-of SQL: ASOF JOIN requires an ON clause")
    val onEnd = onClauseEnd(masked, onIdx + 2)
    val hasMc = masked.regionMatches(true, onEnd, "MATCH_CONDITION", 0,
      "MATCH_CONDITION".length)
    // NB: explicit substrings throughout — scala.StringBuilder has no
    // 3-arg CharSequence append; (s, a, b) would silently hit
    // append(x: Any).
    if (hasMc) {
      val mcIdx = onEnd
      val (mcStart, mcEnd, afterMc) = parenSpan(masked, mcIdx + "MATCH_CONDITION".length)
      val (cmpIdx, cmpGe, cmpStrict, cmpLen) = findTimeCmp(masked, mcStart, mcEnd)
      if (cmpIdx < 0) throw new IllegalArgumentException(
        "as-of SQL: MATCH_CONDITION must be one 'l_time >= r_time' (or <=, >, <) comparison")
      val (aTxt, bTxt) = (sql.substring(mcStart, cmpIdx).trim,
        sql.substring(cmpIdx + cmpLen, mcEnd).trim)
      val (ltTxt, rtTxt) = if (cmpGe) (aTxt, bTxt) else (bTxt, aTxt)
      // Optional TIEBREAK (cols...) directly after MATCH_CONDITION's parens.
      val tbKw = "TIEBREAK"
      var afterClause = afterMc
      var tbTxt: Option[String] = None
      var k = afterMc
      while (k < masked.length && masked.charAt(k).isWhitespace) k += 1
      if (masked.regionMatches(true, k, tbKw, 0, tbKw.length) &&
          (k + tbKw.length >= masked.length || !isWordChar(masked.charAt(k + tbKw.length)))) {
        val (tbStart, tbEnd, afterTb) = parenSpan(masked, k + tbKw.length)
        tbTxt = Some(sql.substring(tbStart, tbEnd).trim)
        afterClause = afterTb
      }
      val base = if (isLeft) "graft_asof_match" else "graft_asof_match_inner"
      val marker = (if (cmpStrict) base + "_strict" else base) +
        s"($ltTxt, $rtTxt${tbTxt.map(t => s", $t").getOrElse("")})"
      val sb = new StringBuilder
      sb.append(sql.substring(0, m.start()))
      sb.append("LEFT JOIN")
      sb.append(sql.substring(m.end(), onIdx))
      sb.append("ON (")
      sb.append(sql.substring(onIdx + 2, mcIdx).trim)
      sb.append(") AND ")
      sb.append(marker)
      sb.append(sql.substring(afterClause))
      sb.toString
    } else {
      // ON-conjunct form (DuckDB's and ClickHouse's native spelling):
      // the inequality is one of the ON clause's depth-0 conjuncts.
      val conj = splitTopAnd(masked, onIdx + 2, onEnd)
      val cls = conj.map { case (s0, e0) => (s0, e0, findTimeCmp(masked, s0, e0)) }
      val ineqs = cls.filter(_._3._1 >= 0)
      if (ineqs.isEmpty) throw new IllegalArgumentException(
        "as-of SQL: ASOF JOIN requires MATCH_CONDITION (l_time >= r_time) " +
          "or the inequality as an ON conjunct (the DuckDB/ClickHouse " +
          "form: ON l.k = r.k AND l.t >= r.t)")
      if (ineqs.length > 1) throw new IllegalArgumentException(
        "as-of SQL: the ASOF JOIN ON clause must carry exactly ONE time " +
          s"inequality conjunct, found ${ineqs.length}")
      val equis = cls.filter(_._3._1 < 0)
      if (equis.isEmpty) throw new IllegalArgumentException(
        "as-of SQL: ASOF JOIN needs at least one equality key conjunct " +
          "alongside the time inequality")
      val (s0, e0, (cmpIdx, cmpGe, cmpStrict, cmpLen)) = ineqs.head
      val (aTxt, bTxt) = (sql.substring(s0, cmpIdx).trim,
        sql.substring(cmpIdx + cmpLen, e0).trim)
      val (ltTxt, rtTxt) = if (cmpGe) (aTxt, bTxt) else (bTxt, aTxt)
      val base = if (isLeft) "graft_asof_match" else "graft_asof_match_inner"
      // Spliced fragments end on fresh lines so a trailing `--` comment
      // inside one cannot swallow the generated text after it.
      val marker = (if (cmpStrict) base + "_strict" else base) +
        s"($ltTxt\n, $rtTxt\n)"
      val sb = new StringBuilder
      sb.append(sql.substring(0, m.start()))
      sb.append("LEFT JOIN")
      sb.append(sql.substring(m.end(), onIdx))
      sb.append("ON (")
      sb.append(equis.map { case (s1, e1, _) => sql.substring(s1, e1).trim }
        .mkString("\n) AND ("))
      sb.append("\n) AND ")
      sb.append(marker)
      sb.append("\n")
      sb.append(sql.substring(onEnd))
      sb.toString
    }
  }
}

/** Delegating parser: rewrites `ASOF JOIN` clauses, hands everything to
  * Spark's parser. Installed by [[graft.GraftExtensions]] via
  * `injectParser`; vanilla sessions reach the same kernel through
  * `AsOf.sql`.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  // Standard SQL must behave exactly as stock, so the ClickHouse rewrite
  // runs ONLY when Spark's own parser rejects the statement: every
  // structural ClickHouse-ism (QUALIFY, LIMIT n BY, PREWHERE,
  // agg(params)(args)) is a stock PARSE error, while standard SQL that
  // merely contains the words — a column aliased `qualify` — parses
  // cleanly and is never touched. The ASOF rewrite stays unconditional:
  // `FROM t ASOF JOIN q` parses cleanly as an alias-plus-join with the
  // WRONG meaning, so it cannot ride the parse-failure gate.
  private def parseWith[T](sqlText: String, f: String => T): T = {
    try f(AsOfSqlRewrite(sqlText))
    catch {
      case e: org.apache.spark.sql.catalyst.parser.ParseException =>
        val ch = try ClickHouseSqlRewrite(sqlText) catch {
          // A named dialect error (a matched CH construct that is
          // malformed) is the better message; carry the parse error along.
          case che: IllegalArgumentException => che.addSuppressed(e); throw che
        }
        if (ch eq sqlText) throw e // no CH syntax — the parse error stands
        try f(AsOfSqlRewrite(ch)) catch {
          // A broken STANDARD statement can still trip a depth-0 trigger
          // word (a column named `settings`) and reach here; when the
          // rewritten text fails to parse too, the ORIGINAL error is the
          // one about the user's own SQL — rethrow it with the
          // rewritten-parse failure attached, mirroring the
          // IllegalArgumentException handling above. AnalysisException
          // covers both ParseException and the parse-time validations
          // Spark raises as ExtendedAnalysisException (e.g. trailing
          // comma); only parsing has run at this point, so any such
          // failure is about the malformed text, and the original names
          // the text the user actually wrote.
          case e2: org.apache.spark.sql.AnalysisException =>
            e.addSuppressed(e2); throw e
        }
    }
  }
  override def parsePlan(sqlText: String): LogicalPlan =
    parseWith(sqlText, delegate.parsePlan)
  override def parsePlanWithParameters(
      sqlText: String, ctx: ParameterContext): LogicalPlan =
    parseWith(sqlText, delegate.parsePlanWithParameters(_, ctx))
  override def parseQuery(sqlText: String): LogicalPlan =
    parseWith(sqlText, delegate.parseQuery)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

/** Converts a `Join` whose condition carries [[AsOfMatch]] into the
  * [[AsOfJoin]] node, with the same key/time validation as the Scala API.
  * `transformUp` (not `resolveOperatorsUp`) so one code path serves both
  * the injected-analyzer-rule install AND post-analysis application on an
  * already-`analyzed`-flagged plan (`AsOf.sql` on vanilla sessions); the
  * marker-presence guard keeps it idempotent either way.
  */
object ResolveAsOfSql extends Rule[LogicalPlan] with PredicateHelper {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException("as-of SQL: " + msg)

  /** Split the non-marker conjuncts into per-position (left, right) equi
    * keys with the Scala APIs' validation — shared by both marker rules.
    */
  private def equiKeys(l: LogicalPlan, r: LogicalPlan,
      keyConds: Seq[Expression]): (Seq[Expression], Seq[Expression]) = {
    val (lks, rks) = keyConds.map {
      case EqualTo(a, b) if a.references.subsetOf(l.outputSet) &&
          b.references.subsetOf(r.outputSet) => (a, b)
      case EqualTo(a, b) if b.references.subsetOf(l.outputSet) &&
          a.references.subsetOf(r.outputSet) => (b, a)
      case other => fail("the ON clause must be AND-ed equality keys plus one " +
        s"match marker; cannot use: ${other.sql}")
    }.unzip
    if (lks.isEmpty) fail("the native join needs at least one equi-key in ON")
    lks.zip(rks).foreach { case (a, b) =>
      if (a.dataType != b.dataType)
        fail(s"key type mismatch: ${a.sql}: ${a.dataType.simpleString} vs " +
          s"${b.sql}: ${b.dataType.simpleString}")
    }
    (lks, rks)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, jt, Some(cond), _)
        if j.childrenResolved && cond.resolved &&
          l.outputSet.intersect(r.outputSet).isEmpty &&
          cond.exists(_.isInstanceOf[IntervalMatch]) =>
      val (markers, keyConds) =
        splitConjunctivePredicates(cond).partition(_.isInstanceOf[IntervalMatch])
      if (markers.length != 1)
        fail("exactly one graft_interval_match per join condition")
      if (jt != Inner && jt != LeftOuter)
        fail(s"the interval join supports INNER and LEFT joins, not $jt")
      val mk = markers.head.asInstanceOf[IntervalMatch]
      val lt = mk.children(0)
      val rt = mk.children(1)
      if (!lt.references.subsetOf(l.outputSet))
        fail("graft_interval_match's first argument must be the LEFT time")
      if (!rt.references.subsetOf(r.outputSet))
        fail("graft_interval_match's second argument must be the RIGHT time")
      val (lo, hi) = mk.bounds
      if (lo > hi) fail(s"interval window is empty: [$lo, $hi]")
      val (lks, rks) = equiKeys(l, r, keyConds)
      IntervalJoin(l, r, lks, rks, lt, rt, lo, hi, isInner = jt == Inner)

    case j @ Join(l, r, jt, Some(cond), _)
        if j.childrenResolved && cond.resolved &&
          l.outputSet.intersect(r.outputSet).isEmpty &&
          cond.exists(_.isInstanceOf[AsOfMatch]) =>
      val (markers, keyConds) =
        splitConjunctivePredicates(cond).partition(_.isInstanceOf[AsOfMatch])
      if (markers.length != 1)
        fail("exactly one graft_asof_match per join condition")
      val mk = markers.head.asInstanceOf[AsOfMatch]
      if (jt != Inner && jt != LeftOuter)
        fail(s"as-of join supports INNER and LEFT joins, not $jt")
      // A null-rejecting filter above may have let the optimizer turn the
      // parser's LEFT JOIN into Inner — honor it; semantics stay aligned
      // because the filter that justified the conversion remains in place.
      val isInner = mk.inner || jt == Inner
      val lt = mk.children(0)
      val rt = mk.children(1)
      val tbs = mk.children.drop(2)
      if (!lt.references.subsetOf(l.outputSet))
        fail("MATCH_CONDITION's >= side must be the LEFT (probe) time — " +
          "forward as-of is not supported; swap the comparison if the right " +
          "time should be at-or-before the left time")
      if (!rt.references.subsetOf(r.outputSet))
        fail("MATCH_CONDITION's <= side must be the RIGHT (quote) time")
      val badTb = tbs.filterNot(_.references.subsetOf(r.outputSet))
      if (badTb.nonEmpty)
        fail(s"TIEBREAK columns must come from the right side: ${badTb.map(_.sql).mkString(", ")}")
      val (lks, rks) = equiKeys(l, r, keyConds)
      AsOfJoin(l, r, lks, rks, lt, rt, tbs, isInner, mk.strict)
  }
}
