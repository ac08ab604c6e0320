package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.types.{LongType, TimestampType}

import graft.plans.{AsOfJoin, AsOfJoinStrategy}

/** Public entry for the native as-of join ([[graft.plans.AsOfJoin]]).
  *
  * Lives under `org.apache.spark.sql` for one reason only: constructing a
  * DataFrame from a custom logical plan needs the `private[sql]`
  * `Dataset.ofRows` — the standard seam every Spark extension library uses
  * for exactly this (there is no public constructor from a LogicalPlan).
  * Everything else goes through public APIs; the planner strategy registers
  * idempotently via `spark.experimental.extraStrategies`, so the operator
  * works in ANY session, not just one built with
  * [[graft.GraftExtensions]] (which also injects it properly).
  */
object AsOf {

  private def ensureStrategy(spark: SparkSession): Unit = {
    // Respect a session that already carries the strategy — via
    // GraftExtensions' injectPlannerStrategy or an earlier call here —
    // so the extensions wiring stays observable (extraStrategies stays
    // empty in an extensions-built session; ExtensionsSpec pins this).
    val planned = spark.asInstanceOf[ClassicSparkSession]
      .sessionState.planner.strategies
    if (!planned.contains(AsOfJoinStrategy)) {
      val cur = spark.experimental.extraStrategies
      if (!cur.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    }
  }

  /** Left as-of join: for each `left` row, the last `right` row with equal
    * keys and `rightTimeCol` ≤ `leftTimeCol`, ties in right time broken by
    * `rightTiebreaks` (take the max) — unmatched left rows keep null right
    * columns. Time columns must be LongType or TimestampType.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTimeCol: String, rightTimeCol: String,
      rightTiebreaks: Seq[String] = Nil): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      "as-of join needs matching non-empty key lists")
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    val lt = attr(lPlan, leftTimeCol)
    val rt = attr(rPlan, rightTimeCol)
    Seq(lt, rt).foreach { a =>
      require(a.dataType == LongType || a.dataType == TimestampType,
        s"as-of time column ${a.name} must be LongType/TimestampType, got ${a.dataType}")
    }
    val node = AsOfJoin(lPlan, rPlan,
      leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
      lt, rt, rightTiebreaks.map(attr(rPlan, _)))
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], node)
  }
}
