package graft

import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Output-type discipline sweep over every ORACLED query: the driver's
  * correctness gate hashes rendered values, so a Spark DOUBLE column where
  * the DuckDB oracle emits BIGINT fails the hash even when every value
  * agrees (`2144.0` vs `2144` — the exact round-8 failure mode of
  * `percentile_disc`, which Spark types DOUBLE even over a BIGINT order
  * column while DuckDB's `quantile_disc` preserves BIGINT).
  *
  * The pin: the exact set of floating-point output columns per oracled
  * query, seeded from a schema sweep at a hash-green round (each pinned
  * column hash-matched its oracle, i.e. DuckDB also renders it DOUBLE
  * there — source DOUBLE columns, sums/avgs of doubles, genuine ratios).
  * Any NEW floating-point column in an oracled query fails here until it
  * is consciously added with the same justification — which forces the
  * `percentile_disc`-over-integers class (and friends like `avg`,
  * `cume_dist`) through an explicit cast decision instead of silently
  * shipping a DOUBLE the oracle will render as BIGINT.
  *
  * Schema derivation is lazy (no query executes), so the sweep is a
  * static check over all ~240 oracled plans.
  */
class SchemaDisciplineSpec extends SparkSpec {

  /** Floating-point output columns the oracle ALSO renders as DOUBLE
    * (evidence: every one of these queries was rows+schema+hash green in
    * CORRECTNESS_r08 / the round-9 verify with these exact columns).
    */
  val pinnedFloatCols: Map[String, Seq[String]] = Map(
    "agg_cube" -> Seq("sum_price"),
    "agg_histogram" -> Seq("total"),
    "agg_percentile_disc" -> Seq("p50_disc", "p90_disc"),
    "agg_percentiles" -> Seq("p50", "p90"),
    "agg_pricing_summary" -> Seq("sum_qty", "sum_base", "sum_disc", "avg_qty"),
    "agg_regression" -> Seq("slope_cents", "intercept_cents", "corr_xy"),
    "agg_rollup" -> Seq("sum_value"),
    "agg_salted_user" -> Seq("sum_value"),
    "agg_skew_kurt" -> Seq("skewness", "excess_kurtosis"),
    "agg_stddev_median" -> Seq("sd", "med"),
    "curation_dup_rate" -> Seq("dup_rate"),
    "custom_query_extract" -> Seq("value"),
    "events_ab_lift" -> Seq("p_a", "p_b", "lift", "p_pool", "se", "z"),
    "events_anomaly_mad" -> Seq("value", "robust_z"),
    "events_attribution" -> Seq("linear_credit"),
    "events_attribution_direct" -> Seq("linear_credit"),
    "events_ewma" -> Seq("ewma_cents"),
    "events_markov" -> Seq("p"),
    "events_outliers" -> Seq("value", "z"),
    "events_retention" -> Seq("retained_pct"),
    "extract_full" -> Seq("o_totalprice"),
    "extract_incr_bounds" -> Seq("value"),
    "extract_incr_initial" -> Seq("value"),
    "extract_incr_lower_only" -> Seq("value"),
    "extract_incr_watermark" -> Seq("value"),
    "generator_stack" -> Seq("val"),
    "join_bloom_anti" -> Seq("o_totalprice"),
    "join_inner_hash" -> Seq("o_totalprice"),
    "join_lateral_topn" -> Seq("o_totalprice"),
    "join_multiway" -> Seq("revenue"),
    "join_salted" -> Seq("o_totalprice"),
    "orders_cohort" -> Seq("revenue"),
    "orders_pareto" -> Seq("share"),
    "scalar_array" -> Seq("first", "l2_norm"),
    "scalar_array_extras" -> Seq("rev_first", "last_elem"),
    "scalar_conditional" -> Seq("capped", "floored"),
    "scalar_math" -> Seq("net", "adisc"),
    "scalar_try_safe" -> Seq("safe_div"),
    "scan_avro_roundtrip" -> Seq("value"),
    "scan_csv_roundtrip" -> Seq("value"),
    "scan_full" -> Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    "scan_json_roundtrip" -> Seq("value"),
    "scan_orc_roundtrip" -> Seq("value"),
    "scan_partitioned" -> Seq("l_quantity"),
    "scan_schema_evolution" -> Seq("value"),
    "scan_xml_roundtrip" -> Seq("value"),
    "sink_coalesce" -> Seq("o_totalprice"),
    "sink_partitioned_prune" -> Seq("o_totalprice"),
    "sort_limit_topk" -> Seq("l_extendedprice"),
    // r12/r13: f64 is a genuine double lane (the oracle computes the
    // same DOUBLE arithmetic); f32_zero pins the Float32 type default
    // against DuckDB's REAL. The u64_big DECIMAL(20,0) lane was the one
    // r12 hash-red row (value-correct, carrier-rendered differently by
    // the two engines' drivers) — r13 compares it through toString;
    // ClickHouseSqlSpec pins the DECIMAL(20,0) carrier type itself.
    "sql_ch_conv" -> Seq("f64", "f32_zero"),
    // r12: the published geohash decode values are exact binary
    // midpoints — both sides render the same DOUBLE.
    "sql_ch_geo" -> Seq("ez_lon", "ez_lat"),
    "sql_tpch_q1" -> Seq("sum_qty", "sum_base_price", "sum_disc_price",
      "sum_charge", "avg_qty", "avg_price", "avg_disc"),
    "sql_tpch_q10" -> Seq("revenue"),
    "sql_tpch_q11" -> Seq("part_value"),
    "sql_tpch_q14" -> Seq("promo_revenue_pct"),
    "sql_tpch_q15" -> Seq("total_revenue"),
    "sql_tpch_q17" -> Seq("avg_yearly"),
    "sql_tpch_q18" -> Seq("total_qty"),
    "sql_tpch_q19" -> Seq("revenue"),
    "sql_tpch_q2" -> Seq("s_acctbal"),
    "sql_tpch_q20" -> Seq("s_acctbal"),
    "sql_tpch_q22" -> Seq("totacctbal"),
    "sql_tpch_q3" -> Seq("revenue"),
    "sql_tpch_q5" -> Seq("revenue"),
    "sql_tpch_q6" -> Seq("revenue"),
    "sql_tpch_q7" -> Seq("revenue"),
    "sql_tpch_q8" -> Seq("mkt_share"),
    "sql_tpch_q9" -> Seq("sum_profit"),
    "stream_sliding" -> Seq("sum_value"),
    "text_entropy" -> Seq("token_entropy"),
    "text_lm_score" -> Seq("avg_log2p"),
    "text_quality" -> Seq("mean_word_len", "stopword_ratio"),
    "text_repetition" -> Seq("uniq_token_frac", "top_token_frac", "dup_bigram_frac"),
    "text_stats" -> Seq("avg_chars"),
    "text_tfidf" -> Seq("score"),
    "text_vocab_coverage" -> Seq("cum_frac"),
    "typed_event_stats" -> Seq("sum_value"),
    "udaf_stable_mean" -> Seq("mean_value"),
    "window_cume_dist" -> Seq("o_totalprice", "cd"),
    "window_moving_avg" -> Seq("mavg"),
    // The two-pass variant emits the identical relation (same oracle,
    // equality pinned in OpsSpec), so the same floor-scaled double column.
    "window_moving_avg_twopass" -> Seq("mavg"),
    "window_nth_lead" -> Seq("third", "lead2"),
    "window_percent_rank" -> Seq("value", "pr", "cd"),
    "window_range_frame" -> Seq("hour_sum"),
    "window_range_interval" -> Seq("hr_sum"),
    "window_rank_topn" -> Seq("o_totalprice"),
    "window_rolling_median" -> Seq("o_totalprice", "med7"),
    "window_running_sum" -> Seq("run_sum"),
  )

  test("every oracled query's floating-point output columns match the pinned allowlist") {
    val oracled = SparkEntry.queries.filter(kv => SparkEntry.oracleSql.contains(kv._1))
    val found: Map[String, Seq[String]] = oracled.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val cols = fn(spark, sf).schema.fields.collect {
          case f if f.dataType == DoubleType || f.dataType == FloatType => f.name
        }.toSeq
        if (cols.nonEmpty) Some(name -> cols) else None
    }.toMap
    val unexpected = found.flatMap { case (n, cols) =>
      val extra = cols.diff(pinnedFloatCols.getOrElse(n, Seq.empty))
      if (extra.nonEmpty) Some(s"$n -> $extra") else None
    }
    val stale = pinnedFloatCols.flatMap { case (n, cols) =>
      val gone = cols.diff(found.getOrElse(n, Seq.empty))
      if (gone.nonEmpty) Some(s"$n -> $gone") else None
    }
    assert(unexpected.isEmpty,
      s"NEW floating-point columns in oracled queries (does DuckDB render " +
        s"these DOUBLE? percentile_disc-over-integers does NOT): $unexpected")
    assert(stale.isEmpty, s"pinned float columns no longer present: $stale")
  }

  test("the three round-8 percentile hash-fail queries now emit BIGINT percentiles") {
    for ((name, intCols) <- Seq(
        "events_funnel_time" -> Seq("p50_min", "p90_min"),
        "orders_lead_time" -> Seq("p50_days", "p90_days", "p99_days"),
        "orders_interarrival" -> Seq("p50_days", "p90_days"))) {
      val schema = SparkEntry.queries(name)(spark, sf).schema
      for (c <- intCols)
        assert(schema(c).dataType == org.apache.spark.sql.types.LongType,
          s"$name.$c must be LongType to hash-match DuckDB quantile_disc over BIGINT")
    }
  }
}
