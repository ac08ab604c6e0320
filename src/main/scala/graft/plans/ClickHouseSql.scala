package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types._

/** ClickHouse SQL dialect compat for the `custom_query` migration path.
  *
  * The reference outsources its entire analytic surface to ClickHouse SQL:
  * `custom_query` bodies are executed verbatim by ClickHouse over JDBC
  * (`mkpipe_extractor_clickhouse/__init__.py:45-50,96-101`; README.md:63
  * shows one). A user switching to this engine brings those queries with
  * ClickHouse-isms in them — so the engine accepts the common ones
  * natively rather than demanding a hand-port:
  *
  *   - `LIMIT n BY k1, k2` — ClickHouse's distinctive per-group limit
  *     clause, rewritten to the standard row_number window filter;
  *   - `QUALIFY pred` — window-result filtering (ClickHouse 23.2+, also
  *     DuckDB/Snowflake), rewritten to a wrapped subquery + WHERE;
  *   - parameterized quantiles `quantileExact(p)(x)` / `quantile(p)(x)`
  *     (and the plural `quantiles*` forms) — ClickHouse's
  *     aggregate(params)(args) call syntax, rewritten to
  *     `percentile` / `approx_percentile`;
  *   - `uniqExact(...)` / `uniq(...)` — rewritten to `count(DISTINCT …)` /
  *     `approx_count_distinct(…)` (the DISTINCT flag cannot ride a
  *     function registration, so these two are textual);
  *   - combinator and conversion FUNCTIONS (`argMax`, `argMin`, `countIf`,
  *     `sumIf`, `avgIf`, `multiIf`, `has`, `toInt64` …) — plain
  *     registrations in [[ClickHouseFunctions]], no parser work.
  *
  * All rewrites are pure string→string on the [[AsOfSqlRewrite]]
  * discipline: string literals / backticks / comments are masked before
  * any keyword scan, spans are balanced-paren walks, slices always come
  * from the ORIGINAL text at masked offsets, and a fixpoint loop handles
  * nesting. Unsupported corners fail LOUDLY with named errors instead of
  * silently changing semantics: `QUALIFY` under `SELECT DISTINCT`
  * (ClickHouse filters before the distinct — a wrapped rewrite would
  * not), `LIMIT BY` without `ORDER BY` (non-deterministic per-group picks
  * have no place in an engine whose gate is a bit-exact oracle diff), the
  * `LIMIT offset, n BY` form, and ordinal ORDER BY items under `LIMIT BY`
  * (an ordinal means a CONSTANT inside a window spec — a silent
  * semantics change).
  *
  * Installed two ways, same kernel: extension sessions get the rewrite
  * inside [[GraftSqlParser]] plus the function registrations from
  * `GraftExtensions`; vanilla sessions call [[ClickHouseSql.sql]].
  */
object ClickHouseSqlRewrite {

  import AsOfSqlRewrite.{findKeyword, isWordChar, mask, parenSpan}

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

  private def rewriteOne(sql: String): String = {
    val a = rewriteParamAgg(sql); if (a ne sql) return a
    val b = rewriteUniq(sql); if (b ne sql) return b
    val c = rewriteQualify(sql); if (c ne sql) return c
    val d = rewriteLimitBy(sql); if (d ne sql) return d
    val e = rewritePrewhere(sql); if (e ne sql) return e
    sql
  }

  // ---------------------------------------------------------------- helpers

  /** Keywords that end a trailing clause (a QUALIFY predicate, a LIMIT BY
    * key list) at relative depth 0.
    */
  private val ClauseEnders = Seq(
    "ORDER", "LIMIT", "OFFSET", "UNION", "INTERSECT", "EXCEPT",
    "WINDOW", "SETTINGS", "FORMAT")

  /** WHERE-position predicates additionally end at the mid-query clauses. */
  private val WhereEnders = Seq("GROUP", "HAVING", "QUALIFY") ++ ClauseEnders

  /** End offset of the clause starting at `from`: the first depth-0 ender
    * keyword, the ')' closing the enclosing scope, or end-of-string.
    */
  private def clauseEnd(masked: String, from: Int,
      enders: Seq[String] = ClauseEnders): Int = {
    var i = from
    var depth = 0
    while (i < masked.length) {
      val c = masked.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth < 0) return i }
      else if (depth == 0 && enders.exists(kw =>
          masked.regionMatches(true, i, kw, 0, kw.length) &&
            (i == 0 || !isWordChar(masked.charAt(i - 1))) &&
            (i + kw.length >= masked.length || !isWordChar(masked.charAt(i + kw.length)))))
        return i
      i += 1
    }
    masked.length
  }

  /** SELECT keywords of the scope owning position `at` — (first, last)
    * SELECT seen at `at`'s own paren depth since that scope opened, with
    * deeper records cleared when their scope closes. The LAST is the
    * owning select of a trailing clause; the FIRST bounds the scope's
    * set-operation scan. (−1, −1) if none.
    */
  private def owningSelect(masked: String, at: Int): (Int, Int) = {
    val lastAt = scala.collection.mutable.ArrayBuffer.fill(1)(-1)
    val firstAt = scala.collection.mutable.ArrayBuffer.fill(1)(-1)
    var depth = 0
    var i = 0
    while (i < at) {
      val c = masked.charAt(i)
      if (c == '(') {
        depth += 1
        if (lastAt.size <= depth) { lastAt += -1; firstAt += -1 }
        else { lastAt(depth) = -1; firstAt(depth) = -1 }
      } else if (c == ')') {
        if (depth >= 0 && depth < lastAt.size) { lastAt(depth) = -1; firstAt(depth) = -1 }
        depth -= 1
      } else if (masked.regionMatches(true, i, "SELECT", 0, 6) &&
          (i == 0 || !isWordChar(masked.charAt(i - 1))) &&
          (i + 6 >= masked.length || !isWordChar(masked.charAt(i + 6)))) {
        if (lastAt.size <= depth) {
          lastAt ++= Seq.fill(depth - lastAt.size + 1)(-1)
          firstAt ++= Seq.fill(depth - firstAt.size + 1)(-1)
        }
        lastAt(depth) = i
        if (firstAt(depth) < 0) firstAt(depth) = i
      }
      i += 1
    }
    if (depth >= 0 && depth < lastAt.size) (firstAt(depth), lastAt(depth))
    else (-1, -1)
  }

  private def failIfDistinct(masked: String, selIdx: Int, what: String): Unit = {
    var i = selIdx + 6
    while (i < masked.length && masked.charAt(i).isWhitespace) i += 1
    if (masked.regionMatches(true, i, "DISTINCT", 0, 8) &&
        (i + 8 >= masked.length || !isWordChar(masked.charAt(i + 8))))
      throw new IllegalArgumentException(
        s"ClickHouse SQL: $what under SELECT DISTINCT is not supported " +
          "(ClickHouse filters before the distinct; the rewrite cannot) — " +
          "wrap the DISTINCT in a subquery")
  }

  /** True when any depth-0 comma-separated item of `masked` span starts
    * with a bare integer (an ORDER BY / PARTITION BY ordinal).
    */
  private def hasOrdinalItem(masked: String, from: Int, until: Int): Boolean = {
    var itemStart = from
    var depth = 0
    var i = from
    def startsWithInt(s: Int, e: Int): Boolean = {
      var j = s
      while (j < e && masked.charAt(j).isWhitespace) j += 1
      val d0 = j
      while (j < e && masked.charAt(j).isDigit) j += 1
      j > d0 && (j >= e || !isWordChar(masked.charAt(j)) && masked.charAt(j) != '.')
    }
    while (i <= until) {
      val c = if (i < until) masked.charAt(i) else ','
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (c == ',' && depth == 0) {
        if (startsWithInt(itemStart, i)) return true
        itemStart = i + 1
      }
      i += 1
    }
    false
  }

  private def hasDepth0Comma(masked: String, from: Int, until: Int): Boolean = {
    var depth = 0
    var i = from
    while (i < until) {
      val c = masked.charAt(i)
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (c == ',' && depth == 0) return true
      i += 1
    }
    false
  }

  // --------------------------------------- 1. quantile(p)(x) call syntax

  private val ParamAggRe = java.util.regex.Pattern.compile(
    "(?i)\\b(quantilesExact|quantileExact|quantiles|quantile)\\s*\\(")

  /** `quantileExact(0.9)(x)` → `percentile(x, 0.9)` etc. — ClickHouse's
    * parameterized-aggregate call syntax `agg(params)(args)`. The plural
    * forms produce arrays: `quantilesExact(a, b)(x)` →
    * `percentile(x, array(a, b))`.
    */
  private def rewriteParamAgg(sql: String): String = {
    val masked = mask(sql)
    val m = ParamAggRe.matcher(masked)
    var searchFrom = 0
    while (m.find(searchFrom)) {
      val name = m.group(1).toLowerCase
      val (pStart, pEnd, afterP) = parenSpan(masked, m.end() - 1)
      var k = afterP
      while (k < masked.length && masked.charAt(k).isWhitespace) k += 1
      if (k < masked.length && masked.charAt(k) == '(') {
        val (aStart, aEnd, afterA) = parenSpan(masked, k)
        val params = sql.substring(pStart, pEnd).trim
        val args = sql.substring(aStart, aEnd).trim
        val (fn, plural) = name match {
          case "quantileexact" => ("percentile", false)
          case "quantile" => ("approx_percentile", false)
          case "quantilesexact" => ("percentile", true)
          case "quantiles" => ("approx_percentile", true)
        }
        val pTxt = if (plural) s"array($params)" else params
        return sql.substring(0, m.start()) + s"$fn($args, $pTxt)" +
          sql.substring(afterA)
      }
      // A single-paren call (no parameter group): not the ClickHouse
      // syntax — leave it for analysis to reject by name.
      searchFrom = m.end()
    }
    sql
  }

  // ------------------------------------------------- 2. uniq / uniqExact

  private val UniqRe = java.util.regex.Pattern.compile(
    "(?i)\\b(uniqExact|uniq)\\s*\\(")

  /** `uniqExact(…)` → `count(DISTINCT …)`; `uniq(…)` →
    * `approx_count_distinct(…)` (multi-arg via a struct key). Textual
    * because the DISTINCT flag lives on the aggregate EXPRESSION, not the
    * function, so no registry alias can carry it.
    */
  private def rewriteUniq(sql: String): String = {
    val masked = mask(sql)
    val m = UniqRe.matcher(masked)
    if (!m.find()) return sql
    val exact = m.group(1).equalsIgnoreCase("uniqExact")
    val (aStart, aEnd, afterA) = parenSpan(masked, m.end() - 1)
    val args = sql.substring(aStart, aEnd).trim
    val multi = hasDepth0Comma(masked, aStart, aEnd)
    val repl =
      if (exact) s"count(DISTINCT $args)"
      else if (multi) s"approx_count_distinct(struct($args))"
      else s"approx_count_distinct($args)"
    sql.substring(0, m.start()) + repl + sql.substring(afterA)
  }

  // ------------------------------------------------------------ 3. QUALIFY

  private val QualifyRe = java.util.regex.Pattern.compile("(?i)\\bQUALIFY\\b")

  /** `SELECT <list> FROM … QUALIFY <pred> <tail>` →
    * `SELECT * EXCEPT (__graft_qualify) FROM
    *    (SELECT <list>, (<pred>) AS __graft_qualify FROM …)
    *  WHERE __graft_qualify <tail>`.
    *
    * The predicate joins the select list, so it may reference both select
    * aliases (lateral column alias resolution) and fresh window
    * expressions; the original tail (ORDER BY / LIMIT) moves outside the
    * wrap, where the subquery still exposes every select alias, and
    * star-EXCEPT keeps the output schema exactly the original list.
    */
  private def rewriteQualify(sql: String): String = {
    val masked = mask(sql)
    val m = QualifyRe.matcher(masked)
    if (!m.find()) return sql
    val qIdx = m.start()
    val (_, selIdx) = owningSelect(masked, qIdx)
    if (selIdx < 0) throw new IllegalArgumentException(
      "ClickHouse SQL: QUALIFY without an owning SELECT")
    failIfDistinct(masked, selIdx, "QUALIFY")
    val fromIdx = findKeyword(masked, selIdx + 6, "FROM")
    if (fromIdx < 0 || fromIdx > qIdx) throw new IllegalArgumentException(
      "ClickHouse SQL: QUALIFY requires a FROM clause")
    val predStart = m.end()
    val predEnd = clauseEnd(masked, predStart)
    val pred = sql.substring(predStart, predEnd).trim
    if (pred.isEmpty) throw new IllegalArgumentException(
      "ClickHouse SQL: empty QUALIFY predicate")
    val selectList = sql.substring(selIdx + 6, fromIdx).trim
    val mid = sql.substring(fromIdx, qIdx).trim
    sql.substring(0, selIdx) +
      "SELECT * EXCEPT (__graft_qualify) FROM (SELECT " + selectList +
      ", (" + pred + ") AS __graft_qualify " + mid +
      ") WHERE __graft_qualify " + sql.substring(predEnd)
  }

  // ----------------------------------------------------------- 4. PREWHERE

  private val PrewhereRe = java.util.regex.Pattern.compile("(?i)\\bPREWHERE\\b")

  /** `PREWHERE pred` → merged into `WHERE`. In ClickHouse PREWHERE is a
    * pure scan optimization (read the predicate's columns first, filter,
    * then read the rest) with the SEMANTICS of an additional conjunct —
    * which is exactly what Catalyst's predicate pushdown + parquet column
    * pruning already do to a plain WHERE, so the merge loses nothing.
    */
  private def rewritePrewhere(sql: String): String = {
    val masked = mask(sql)
    val m = PrewhereRe.matcher(masked)
    if (!m.find()) return sql
    val predStart = m.end()
    // The PREWHERE predicate also ends at a following WHERE (the one
    // clause that may legally follow it), besides the shared enders.
    val whereEnd = {
      val w = findKeyword(masked, predStart, "WHERE")
      val e = clauseEnd(masked, predStart, WhereEnders)
      if (w >= 0 && w < e) w else e
    }
    val pred = sql.substring(predStart, whereEnd).trim
    if (pred.isEmpty) throw new IllegalArgumentException(
      "ClickHouse SQL: empty PREWHERE predicate")
    // Merge with a directly-following WHERE when present.
    val k = whereEnd
    val isWhere = masked.regionMatches(true, k, "WHERE", 0, 5) &&
      (k + 5 >= masked.length || !isWordChar(masked.charAt(k + 5)))
    if (isWhere) {
      val wPredStart = k + 5
      val wPredEnd = clauseEnd(masked, wPredStart, WhereEnders)
      val wPred = sql.substring(wPredStart, wPredEnd).trim
      sql.substring(0, m.start()) + s"WHERE ($pred) AND ($wPred) " +
        sql.substring(wPredEnd)
    } else {
      sql.substring(0, m.start()) + s"WHERE $pred " + sql.substring(whereEnd)
    }
  }

  // --------------------------------------------------------- 5. LIMIT n BY

  private val LimitByRe = java.util.regex.Pattern.compile(
    "(?i)\\bLIMIT\\s+(\\d+)\\s+BY\\b")
  private val LimitOffsetByRe = java.util.regex.Pattern.compile(
    "(?i)\\bLIMIT\\s+\\d+\\s*,\\s*\\d+\\s+BY\\b")

  /** `SELECT … ORDER BY <sort> LIMIT n BY <keys> [LIMIT m]` →
    * a double wrap: the original select (minus ORDER BY/LIMIT) becomes
    * the inner subquery, a row_number over (PARTITION BY keys ORDER BY
    * sort) ranks its OUTPUT columns (so keys and sort may be select
    * aliases without leaning on lateral resolution inside a window spec),
    * and the outer level filters rn ≤ n, re-applies the sort, and carries
    * any trailing LIMIT. ORDER BY is REQUIRED: ClickHouse's
    * unordered LIMIT BY picks arbitrary rows per group, which an engine
    * gated on bit-exact oracle diffs must refuse, not emulate.
    */
  private def rewriteLimitBy(sql: String): String = {
    val masked = mask(sql)
    if (LimitOffsetByRe.matcher(masked).find())
      throw new IllegalArgumentException(
        "ClickHouse SQL: the LIMIT offset, n BY form is not supported — " +
          "use LIMIT n BY and a WHERE rank filter for the offset")
    val m = LimitByRe.matcher(masked)
    if (!m.find()) return sql
    val lIdx = m.start()
    val n = m.group(1)
    val (firstSelIdx, selIdx) = owningSelect(masked, lIdx)
    if (selIdx < 0) throw new IllegalArgumentException(
      "ClickHouse SQL: LIMIT BY without an owning SELECT")
    failIfDistinct(masked, selIdx, "LIMIT BY")
    val keysStart = m.end()
    val keysEnd = clauseEnd(masked, keysStart)
    val keys = sql.substring(keysStart, keysEnd).trim
    if (keys.isEmpty) throw new IllegalArgumentException(
      "ClickHouse SQL: empty LIMIT BY key list")
    // A set operator between the owning SELECT and the LIMIT BY means the
    // ORDER BY is union-level and the rewrite would mis-scope the filter
    // to one arm. (Star-EXCEPT — `* EXCEPT (…)` — is not a set operator:
    // it is recognized by the preceding '*'.)
    for (op <- Seq("UNION", "INTERSECT", "EXCEPT")) {
      var s = firstSelIdx + 6
      var found = -1
      while (found < 0 && s < lIdx) {
        val idx = findKeyword(masked, s, op)
        if (idx < 0 || idx >= lIdx) s = lIdx
        else {
          var p = idx - 1
          while (p >= 0 && masked.charAt(p).isWhitespace) p -= 1
          if (p >= 0 && masked.charAt(p) == '*') s = idx + op.length
          else found = idx
        }
      }
      if (found >= 0) throw new IllegalArgumentException(
        "ClickHouse SQL: LIMIT BY over a set operation is ambiguous — " +
          "wrap the union in a subquery")
    }
    val oIdx = findKeyword(masked, selIdx + 6, "ORDER")
    if (oIdx < 0 || oIdx > lIdx) throw new IllegalArgumentException(
      "ClickHouse SQL: LIMIT BY requires an ORDER BY (the unordered form " +
        "picks arbitrary rows per group — order the query to make the " +
        "per-group selection deterministic)")
    val byIdx = findKeyword(masked, oIdx + 5, "BY")
    if (byIdx < 0) throw new IllegalArgumentException(
      "ClickHouse SQL: malformed ORDER BY")
    val sort = sql.substring(byIdx + 2, lIdx).trim
    if (hasOrdinalItem(masked, byIdx + 2, lIdx) ||
        hasOrdinalItem(masked, keysStart, keysEnd))
      throw new IllegalArgumentException(
        "ClickHouse SQL: ordinal ORDER BY / LIMIT BY items are not " +
          "supported with LIMIT BY (inside a window spec an ordinal is a " +
          "CONSTANT, silently changing semantics) — name the columns")
    val core = sql.substring(selIdx, oIdx).trim
    sql.substring(0, selIdx) +
      "SELECT * EXCEPT (__graft_limit_by_rn) FROM (SELECT *, row_number()" +
      " OVER (PARTITION BY " + keys + " ORDER BY " + sort +
      ") AS __graft_limit_by_rn FROM (" + core +
      ")) WHERE __graft_limit_by_rn <= " + n +
      " ORDER BY " + sort + " " + sql.substring(keysEnd)
  }
}

/** ClickHouse combinator / conversion functions as plain Spark expression
  * registrations — shared by `GraftExtensions.injectFunction` and the
  * vanilla-session registrar in [[ClickHouseSql]]. Every mapping is an
  * EXACT-semantics translation onto stock codegen'd expressions (no UDFs):
  *
  *   - `argMax(a, b)` / `argMin(a, b)` → max_by / min_by
  *   - `countIf(cond)` → count(if(cond, 1, null)) — counts rows where the
  *     condition is true (null-condition rows excluded, as ClickHouse)
  *   - `sumIf(x, cond)` → coalesce(sum(if(cond, x, null)), 0) — ClickHouse
  *     returns 0, not null, when no row matches
  *   - `avgIf(x, cond)` → avg(if(cond, x, null)) — NULL when no row
  *     matches where ClickHouse returns NaN (NaN has no exact SQL
  *     literal; documented divergence)
  *   - `multiIf(c1, v1, …, else)` → CASE WHEN chain
  *   - `has(arr, x)` → array_contains
  *   - `toInt64/toInt32/toUInt32/toUInt64/toFloat64/toFloat32/toString/
  *     toDate/toDateTime` → casts (UInt32 widens to BIGINT; UInt64 to
  *     DECIMAL(20,0) — the only integral type covering its range)
  */
object ClickHouseFunctions {

  private def cast(to: DataType): Seq[Expression] => Expression = { es =>
    require(es.length == 1, s"conversion functions take one argument, got ${es.length}")
    Cast(es.head, to)
  }

  /** (name, usage, builder) — names are registered case-insensitively. */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("argMax", "argMax(a, b) - value of a at the row with the maximum b",
      es => { require(es.length == 2, "argMax(a, b)"); MaxBy(es(0), es(1)) }),
    ("argMin", "argMin(a, b) - value of a at the row with the minimum b",
      es => { require(es.length == 2, "argMin(a, b)"); MinBy(es(0), es(1)) }),
    ("countIf", "countIf(cond) - number of rows where cond is true",
      es => { require(es.length == 1, "countIf(cond)")
        Count(Seq(If(es.head, Literal(1), Literal.create(null, IntegerType)))) }),
    ("sumIf", "sumIf(x, cond) - sum of x over rows where cond is true; 0 when none",
      es => { require(es.length == 2, "sumIf(x, cond)")
        Coalesce(Seq(
          Sum(If(es(1), es(0), Literal.create(null, NullType))).toAggregateExpression(),
          Literal(0L))) }),
    ("avgIf", "avgIf(x, cond) - average of x over rows where cond is true; NULL when none",
      es => { require(es.length == 2, "avgIf(x, cond)")
        Average(If(es(1), es(0), Literal.create(null, NullType))) }),
    ("multiIf", "multiIf(c1, v1, ..., else) - first value whose condition is true",
      es => { require(es.length >= 3 && es.length % 2 == 1,
          "multiIf needs cond/value pairs plus an else")
        CaseWhen(es.dropRight(1).grouped(2).map(p => (p(0), p(1))).toSeq,
          Some(es.last)) }),
    ("has", "has(arr, x) - true when array arr contains x",
      es => { require(es.length == 2, "has(arr, x)"); ArrayContains(es(0), es(1)) }),
    ("toInt64", "toInt64(x) - cast to BIGINT", cast(LongType)),
    ("toInt32", "toInt32(x) - cast to INT", cast(IntegerType)),
    ("toUInt32", "toUInt32(x) - cast to BIGINT (covers the UInt32 range)", cast(LongType)),
    ("toUInt64", "toUInt64(x) - cast to DECIMAL(20,0) (covers the UInt64 range)",
      cast(DecimalType(20, 0))),
    ("toFloat64", "toFloat64(x) - cast to DOUBLE", cast(DoubleType)),
    ("toFloat32", "toFloat32(x) - cast to FLOAT", cast(FloatType)),
    ("toString", "toString(x) - cast to STRING", cast(StringType)),
    ("toDate", "toDate(x) - cast to DATE", cast(DateType)),
    ("toDateTime", "toDateTime(x) - cast to TIMESTAMP", cast(TimestampType)),
    // Date bucketing — the functions an incremental-ETL custom_query
    // actually leans on. CH's toStartOf{Month,Quarter,Year} return Date
    // (TruncDate), the sub-day ones return DateTime (TruncTimestamp).
    // toStartOfWeek is deliberately ABSENT: ClickHouse's default week
    // starts Sunday, Spark's trunc week starts Monday — a silent
    // semantics change, so the name stays unresolved rather than wrong.
    ("toYear", "toYear(x) - calendar year", one(Year(_))),
    ("toMonth", "toMonth(x) - month 1-12", one(Month(_))),
    ("toDayOfMonth", "toDayOfMonth(x) - day 1-31", one(DayOfMonth(_))),
    ("toHour", "toHour(x) - hour 0-23", one(Hour(_))),
    ("toMinute", "toMinute(x) - minute 0-59", one(Minute(_))),
    ("toSecond", "toSecond(x) - second 0-59", one(Second(_))),
    ("toStartOfDay", "toStartOfDay(x) - midnight of x's day, as TIMESTAMP",
      one(e => TruncTimestamp(Literal("DAY"), Cast(e, TimestampType)))),
    ("toStartOfHour", "toStartOfHour(x) - top of x's hour, as TIMESTAMP",
      one(e => TruncTimestamp(Literal("HOUR"), Cast(e, TimestampType)))),
    ("toStartOfMinute", "toStartOfMinute(x) - top of x's minute, as TIMESTAMP",
      one(e => TruncTimestamp(Literal("MINUTE"), Cast(e, TimestampType)))),
    ("toStartOfMonth", "toStartOfMonth(x) - first day of x's month, as DATE",
      one(e => TruncDate(Cast(e, DateType), Literal("MONTH")))),
    ("toStartOfQuarter", "toStartOfQuarter(x) - first day of x's quarter, as DATE",
      one(e => TruncDate(Cast(e, DateType), Literal("QUARTER")))),
    ("toStartOfYear", "toStartOfYear(x) - first day of x's year, as DATE",
      one(e => TruncDate(Cast(e, DateType), Literal("YEAR")))),
    ("toYYYYMM", "toYYYYMM(x) - year*100 + month, as INT",
      one(e => Add(Multiply(Year(e), Literal(100)), Month(e)))),
    ("toYYYYMMDD", "toYYYYMMDD(x) - year*10000 + month*100 + day, as INT",
      one(e => Add(Multiply(Add(Multiply(Year(e), Literal(100)), Month(e)),
        Literal(100)), DayOfMonth(e)))),
    ("toUnixTimestamp", "toUnixTimestamp(x) - epoch seconds, as BIGINT",
      one(e => UnixTimestamp(Cast(e, TimestampType),
        Literal("yyyy-MM-dd HH:mm:ss")))))

  private def one(f: Expression => Expression): Seq[Expression] => Expression = { es =>
    require(es.length == 1, s"date functions take one argument, got ${es.length}")
    f(es.head)
  }

  /** Per-session idempotent registration for vanilla sessions (the
    * extensions path injects the same builders at session build).
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** Run a ClickHouse-dialect SQL statement on ANY session — the
  * vanilla-session twin of the `GraftExtensions` wiring (where plain
  * `spark.sql` understands the dialect). Same kernel both ways:
  * [[ClickHouseSqlRewrite]] turns the ClickHouse-isms into standard Spark
  * SQL, [[ClickHouseFunctions.register]] supplies the function names, and
  * the statement then also flows through [[AsOfSqlRewrite]] so ASOF
  * clauses keep working inside ported queries.
  */
object ClickHouseSql {
  def sql(spark: SparkSession, chSql: String): DataFrame = {
    ClickHouseFunctions.register(spark)
    org.apache.spark.sql.graft.AsOf.sql(spark, ClickHouseSqlRewrite(chSql))
  }
}
