package graft

import java.sql.Timestamp

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The PushdownNanosTimestamp optimizer rule: predicates over the
  * µs-normalized nanos timestamp must (a) reach the parquet scan as raw-nanos
  * pushed filters and (b) keep exactly the same row semantics at µs
  * boundaries (truncation math).
  */
class PlansSpec extends SparkSpec {

  private def events = Tables.t(spark, sf, "events")

  test("watermark predicate is pushed to the parquet scan") {
    val df = events.filter(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp"))
    val scan = df.queryExecution.executedPlan.toString
    // Two reader regimes, one invariant — the filter must reach the scan:
    //   - Spark ≥4.1.2 reads parquet TIMESTAMP(NANOS) natively as µs-truncated
    //     TIMESTAMP_NTZ and pushes the predicate through the normalizing cast
    //     as an NTZ scan filter (row-group stats apply);
    //   - older readers surface the column as a raw-nanos long
    //     (legacy.parquet.nanosAsLong), where [[PushdownNanosTimestamp]]
    //     rewrites the µs comparison into the equivalent raw-nanos filter.
    val ntzPush = scan.contains("GreaterThanOrEqual(ts,2024-01-15T00:00")
    val nanosPush = scan.contains("GreaterThanOrEqual(ts,1705276800000000000")
    assert(ntzPush || nanosPush, s"pushdown missing from plan:\n$scan")
  }

  test("rewritten comparisons preserve semantics at exact µs boundaries") {
    // Use a real row's truncated-µs value so equality/boundary paths fire.
    val all = events.select(col("event_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val boundary = all.find(_._1 == 5L).get._2
    val bts = new Timestamp(boundary / 1000)
    bts.setNanos(((boundary % 1000000) * 1000).toInt)
    val blit = lit(bts)
    def check(name: String, pred: Column, expected: Long => Boolean): Unit = {
      val got = events.filter(pred).count()
      val want = all.count { case (_, us) => expected(us) }
      assert(got == want, s"$name: spark $got vs expected $want")
    }
    check("geq", col("ts") >= blit, _ >= boundary)
    check("gt", col("ts") > blit, _ > boundary)
    check("lt", col("ts") < blit, _ < boundary)
    check("leq", col("ts") <= blit, _ <= boundary)
    check("eq", col("ts") === blit, _ == boundary)
    check("geq-mirror", blit <= col("ts"), _ >= boundary)
    check("lt-mirror", blit > col("ts"), _ < boundary)
  }

  test("epoch/pre-epoch literals are not rewritten (negative-ns truncation trap)") {
    // IntegralDivide truncates toward zero, so ns=-500 normalizes to µs=0:
    // it must satisfy ts >= epoch. The old unguarded rewrite (ns >= 0) would
    // drop it. The rule now only fires for strictly positive µs literals.
    import spark.implicits._
    graft.plans.PushdownNanosTimestamp.install(spark)
    val df = Seq(-1500L, -500L, 0L, 500L, 1500L).toDF("ns")
      .select(col("ns"), timestamp_micros(expr("ns DIV 1000")).as("ts"))
    val epoch = lit(new Timestamp(0L)) // µs = 0 → not rewritten
    assert(df.filter(col("ts") >= epoch).count() == 4,
      "ns=-500 truncates to µs 0 and must satisfy ts >= epoch")
    // A positive literal is still rewritten (plan shape proven on the parquet
    // scan in the first test), and stays correct for negative ns.
    val oneUs = new Timestamp(0L); oneUs.setNanos(1000)
    assert(df.filter(col("ts") >= lit(oneUs)).count() == 1)
  }

  test("levenshtein guard covers reversed and strict spellings, skips non-deterministic args") {
    graft.plans.LevenshteinLengthGuard.install(spark)
    val c = Tables.t(spark, sf, "customer")
    def opt(cond: String): String =
      c.filter(expr(cond)).queryExecution.optimizedPlan.toString
    // All four equivalent threshold spellings gain the length guard.
    assert(opt("levenshtein(c_name, c_mktsegment) <= 4").contains("abs((length("))
    assert(opt("4 >= levenshtein(c_name, c_mktsegment)").contains("abs((length("))
    assert(opt("levenshtein(c_name, c_mktsegment) < 4").contains("abs((length("))
    assert(opt("4 > levenshtein(c_name, c_mktsegment)").contains("abs((length("))
    // The strict spelling's guard is itself strict (lev ≥ |Δlen|, so
    // lev < k ⟹ |Δlen| < k): the guarded filter keeps exactly the rows a
    // driver-side DP reimplementation keeps — the guard never drops a match.
    def levDp(a: String, b: String): Int = {
      val prev = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var diag = prev(0); prev(0) = i
        for (j <- 1 to b.length) {
          val cur = math.min(math.min(prev(j) + 1, prev(j - 1) + 1),
            diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
          diag = prev(j); prev(j) = cur
        }
      }
      prev(b.length)
    }
    val expected = c.select("c_name", "c_mktsegment").collect()
      .count(r => levDp(r.getString(0), r.getString(1)) < 13)
    assert(c.filter(expr("levenshtein(c_name, c_mktsegment) < 13")).count() == expected)
    // A non-deterministic levenshtein argument must NOT be duplicated into
    // a guard — evaluating it twice would change filter semantics.
    val nd = opt(
      "levenshtein(c_name, concat(c_mktsegment, cast(cast(rand()*10 as int) as string))) <= 4")
    assert(!nd.contains("abs((length("), s"guard duplicated a rand-derived arg:\n$nd")
  }
}
