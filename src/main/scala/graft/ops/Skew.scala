package graft.ops

import graft.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation patterns for 100 TB keys, with correctness proven against
  * the unsalted equivalents (oracle / scalatest).
  *
  * Spark's hash aggregate already does map-side partial aggregation, and AQE
  * splits skewed SMJ partitions at runtime — reach for explicit salting when
  * those don't apply: high-cardinality partials that overflow the hash map,
  * `collect_list`-style holistic aggregates, or joins where one key is so hot
  * a single reducer would own it.
  */
object Skew {

  import Exact.cents

  /** Two-phase salted aggregation: phase 1 aggregates (key, salt) — spreading
    * a hot key over `salts` reducers — phase 2 merges the partials per key.
    * The salt is a deterministic hash of a row-unique column (never rand():
    * re-execution of a lost task must produce the same salt or results
    * drift).
    */
  def aggSaltedUserRevenue(spark: SparkSession, dir: String, salts: Int = 8): DataFrame =
    t(spark, dir, "events")
      .withColumn("salt", pmod(hash(col("event_id")), lit(salts)))
      .groupBy(col("user_id"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(cents(col("value"))).as("ps"))
      .groupBy(col("user_id"))
      .agg(sum(col("pc")).as("cnt"), (sum(col("ps")) / 100.0).as("sum_value"))
      .orderBy("user_id")

  /** Salted broadcast-style join for a hot build side: replicate each small-
    * side row `salts` times with a salt index, salt the probe side by a
    * deterministic row hash, and join on (key, salt) — the hot key's rows
    * spread across `salts` tasks instead of one. Returns the same rows as the
    * plain equi-join (proven in SkewSpec).
    */
  def saltedJoin(
      large: DataFrame, largeKey: Column, largeSaltSrc: Column,
      small: DataFrame, smallKey: Column, salts: Int): DataFrame = {
    val saltedLarge = large.withColumn("__salt", pmod(hash(largeSaltSrc), lit(salts)))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(explodedSmall,
      largeKey === smallKey && saltedLarge("__salt") === explodedSmall("__salt"))
      .drop("__salt")
  }

  /** The salted join as a named query: orders (probe) ⋈ customer (replicated
    * build) — row-identical to `join_inner_hash`, so it shares that oracle
    * shape.
    */
  def joinSaltedCustomer(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    saltedJoin(o, o("o_custkey"), o("o_orderkey"), c, c("c_custkey"), salts = 8)
      .select(o("o_orderkey"), c("c_custkey"), c("c_name"), c("c_mktsegment"), o("o_totalprice"))
      .orderBy("o_orderkey")
  }
}
