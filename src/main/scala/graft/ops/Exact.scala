package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-exact float handling.
  *
  * Two sources of Spark-vs-DuckDB float divergence, and their antidotes:
  *
  *   1. Accumulation order: sums over different partitionings associate
  *      differently. Antidote: map each row to an integer (cents / basis
  *      points) with identical per-row IEEE ops, then integer-sum — exact in
  *      any order.
  *   2. `round()` semantics: Spark rounds via BigDecimal of the double's
  *      shortest decimal repr (so 19570.815 → .82); DuckDB rounds in binary
  *      double space (19570.815*100 = 1957081.49999... → .81). Antidote:
  *      never use `round` where the oracle must agree — use
  *      floor(x*s + 0.5)/s, which is the same IEEE multiply/add/floor/divide
  *      in both engines. (Half-up toward +inf; our measures are positive.)
  */
object Exact {
  /** Per-row exact integer cents of a ~2-decimal positive measure. */
  def cents(c: Column): Column = floor(c * 100 + 0.5).cast("long")

  /** Per-row exact integer basis points (4 decimals). */
  def bp(c: Column): Column = floor(c * 10000 + 0.5).cast("long")

  /** Engine-agnostic round-half-up to 2 decimals (positive inputs). */
  def r2(c: Column): Column = floor(c * 100 + 0.5) / 100.0

  /** Engine-agnostic round-half-up to 4 decimals (positive inputs). */
  def r4(c: Column): Column = floor(c * 10000 + 0.5) / 10000.0
}
