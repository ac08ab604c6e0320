package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the storage-level answer to repeated shuffle
  * joins at 100 TB: write both sides bucketed by the join key, and the
  * sort-merge join runs with NO shuffle exchange on either side.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join without a shuffle exchange") {
    // warehouse.dir is a static conf — use external tables (explicit path)
    // so bucketed data lands in a temp dir regardless of warehouse location.
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    Tables.t(spark, sf, "orders")
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    Tables.t(spark, sf, "customer")
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_b").saveAsTable("customer_b")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"))
      joined.count() // materialize through AQE
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      // Correctness: same rows as the plain join.
      val plain = Tables.t(spark, sf, "orders")
        .join(Tables.t(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
      assert(joined.count() == plain.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
