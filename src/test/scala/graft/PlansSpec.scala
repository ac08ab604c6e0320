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

  test("watermark predicate is pushed to the parquet scan as raw nanos") {
    val df = events.filter(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp"))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("GreaterThanOrEqual(ts,1705276800000000000"),
      s"pushdown missing from plan:\n$scan")
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
}
