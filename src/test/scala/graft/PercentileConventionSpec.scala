package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins the VALUE equivalence `Spark percentile_disc ≡ DuckDB quantile_disc`
  * at the exact boundary group sizes where discrete-percentile conventions
  * diverge (p·n integer vs fractional, even vs odd n, n = 1, p = 0 / 1).
  *
  * Both engines implement the type-1 (inverse empirical CDF) estimator:
  * over the sorted multiset x₁ ≤ … ≤ xₙ, the p-quantile is the SMALLEST
  * xₖ whose cumulative share k/n ≥ p, i.e. k = max(1, ⌈p·n⌉). The test
  * computes that closed form independently in Scala and checks Spark's
  * `percentile_disc` against it for every (n, p) on the boundary grid —
  * including the p·n-integer edges (n = 4, p = 0.5 → k = 2, NOT the
  * upper median) where a type-2/nearest-rank implementation would differ.
  *
  * This is the value half of the round-8 lesson; the TYPE half (Spark
  * renders the result DOUBLE, DuckDB preserves BIGINT, so hash gates need
  * an explicit cast) is enforced by [[SchemaDisciplineSpec]].
  */
class PercentileConventionSpec extends SparkSpec {

  /** Type-1 estimator in one line: smallest order statistic with CDF ≥ p. */
  private def type1(sorted: Seq[Long], p: Double): Long =
    sorted(math.max(1, math.ceil(p * sorted.size - 1e-9).toInt) - 1)

  test("percentile_disc matches the type-1 closed form on every boundary (n, p) cell") {
    import spark.implicits._
    // Non-uniform gaps so adjacent order statistics are distinguishable,
    // duplicates in the longer sets so ties exercise the ≥ (not >) rule.
    val sets: Seq[Seq[Long]] = Seq(
      Seq(7L),                                  // n=1: every p returns the element
      Seq(3L, 9L),                              // even, p·n integer at 0.5
      Seq(1L, 4L, 6L),                          // odd
      Seq(2L, 5L, 5L, 11L),                     // even with tie; p=0.25/0.5/0.75 all integer p·n
      Seq(0L, 2L, 3L, 8L, 13L),                 // odd, p·n fractional at 0.5
      Seq(1L, 1L, 2L, 3L, 5L, 8L, 13L, 21L),    // n=8: p=0.125 grid integer everywhere
      (1L to 10L) ++ Seq(10L, 10L),             // n=12 with a heavy top tie
    )
    val ps = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    for (xs <- sets; p <- ps) {
      val got = xs.toDF("v")
        .agg(expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY v)").cast("long"))
        .head().getLong(0)
      val want = type1(xs.sorted, p)
      assert(got == want,
        s"n=${xs.size} p=$p: percentile_disc=$got, type-1 closed form=$want over ${xs.sorted}")
    }
  }

  test("percentile_disc skips NULL order values — the convention orders_repeat_rate leans on") {
    import spark.implicits._
    // DuckDB's quantile_disc ignores NULLs too, so a single aggregate can
    // mix full-population counts with gap-only percentiles (single-order
    // customers contribute a NULL gap and must not shift the quantile).
    val got = Seq(Some(10L), None, Some(0L), None)
      .toDF("v")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").cast("long"))
      .head().getLong(0)
    assert(got == type1(Seq(0L, 10L), 0.5), s"nulls must be invisible to the percentile: $got")
  }

  test("percentile_disc over BIGINT returns DOUBLE — the cast is load-bearing") {
    import spark.implicits._
    val schema = Seq(1L, 2L).toDF("v")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").as("p"))
      .schema
    // If Spark ever starts preserving the input type here, the explicit
    // casts in events_funnel_time / orders_lead_time / orders_interarrival
    // become no-ops (harmless) and this pin documents the change.
    assert(schema("p").dataType == org.apache.spark.sql.types.DoubleType,
      "Spark changed percentile_disc's return type — revisit the cast discipline")
  }
}
