package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection helper: dumps the formatted physical plan for the named
  * queries (or a default set of plan-critical ones) so pushdown, broadcast
  * choice, aggregate phases, and codegen spans can be audited.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "extract_incr_watermark", "agg_pricing_summary", "join_multiway",
      "sort_limit_topk", "dedup_exact", "window_rank_topn", "join_range_theta",
      "join_asof_native", "text_ngram_novelty", "events_bot_detect",
      "sql_interval_join", "graph_modularity", "curation_token_budget",
      "graph_kcore_bucketed", "sql_ch_limit_by", "custom_query_clickhouse")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
