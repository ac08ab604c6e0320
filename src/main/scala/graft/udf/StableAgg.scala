package graft.udf

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Kahan-compensated running state for a numerically stable mean. */
final case class KahanBuf(sum: Double, comp: Double, n: Long)

/** Typed Aggregator demo (the engine's UDAF extension point — the reference
  * has no UDF/UDAF surface at all, see SURVEY §2.B): a Kahan-summation mean
  * that stays stable when 100 TB worth of doubles are accumulated across
  * partials. Merge also compensates, so partial aggregation (map-side
  * combine) is preserved — the buffer is 24 bytes per group regardless of
  * input size.
  */
object StableMean extends Aggregator[Double, KahanBuf, Double] {
  def zero: KahanBuf = KahanBuf(0.0, 0.0, 0L)

  private def add(b: KahanBuf, x: Double): KahanBuf = {
    val y = x - b.comp
    val s = b.sum + y
    KahanBuf(s, (s - b.sum) - y, b.n + 1)
  }

  def reduce(b: KahanBuf, x: Double): KahanBuf = add(b, x)

  def merge(a: KahanBuf, b: KahanBuf): KahanBuf = {
    val y = b.sum - a.comp
    val s = a.sum + y
    KahanBuf(s, ((s - a.sum) - y) + b.comp, a.n + b.n)
  }

  def finish(b: KahanBuf): Double = if (b.n == 0) Double.NaN else b.sum / b.n

  def bufferEncoder: Encoder[KahanBuf] = Encoders.product[KahanBuf]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object StableAgg {
  /** Per-event-type stable mean of `value`, via functions.udaf registration.
    * Rounded with the cross-engine floor trick (graft.ops.Exact — never
    * Spark/DuckDB round()): the Kahan result sits within ~1e-13 of DuckDB's
    * avg, so at 4 decimals the two agree and the query is oracle-checkable.
    */
  def udafStableMean(spark: SparkSession, dir: String): DataFrame = {
    val stableMean = udaf(StableMean)
    t(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(graft.ops.Exact.r4(stableMean(col("value"))).as("mean_value"))
      .orderBy("event_type")
  }

  /** Scalar UDF extension-point demo (SURVEY §7.6). Deliberately trivial —
    * a slugifier — because the lesson is the preference order: built-in
    * functions (codegen'd) > native Expression > Scala UDF (opaque to
    * Catalyst: no pushdown through it, boxing per row). The oracle expresses
    * the same thing with built-ins, which is also how production code should.
    */
  def udfSlugify(spark: SparkSession, dir: String): DataFrame = {
    val slug = udf((s: String) => if (s == null) null else s.toLowerCase.replace(' ', '-'))
    t(spark, dir, "customer")
      .select(col("c_custkey"), slug(col("c_name")).as("slug"))
      .orderBy("c_custkey")
  }
}
