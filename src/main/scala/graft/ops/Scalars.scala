package graft.ops

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar function surface (string / date / math / json / array) — the class
  * of expressions the reference could only reach through `custom_query` SQL
  * executed by ClickHouse (mkpipe_extractor_clickhouse/__init__.py:96-101).
  * All are codegen'd Catalyst built-ins (whole-stage codegen, no UDFs).
  * Computed integer outputs are cast to long so Spark and DuckDB (which
  * defaults many functions to BIGINT) agree on output schema.
  */
object Scalars {

  /** upper / substring / concat / LIKE over customer. */
  def scalarString(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .select(col("c_custkey"),
        upper(col("c_name")).as("uname"),
        substring(col("c_name"), 1, 8).as("pre"),
        concat(col("c_mktsegment"), lit("#"), col("c_name")).as("tagged"),
        col("c_name").like("%5").as("ends5"))
      .orderBy("c_custkey")

  /** date_trunc day/hour (as epoch micros), day-of-week, date arithmetic.
    * Spark dayofweek is Sunday=1 (DuckDB's is Sunday=0 — oracle adds 1).
    */
  def scalarDate(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"),
        unix_micros(date_trunc("day", col("ts"))).as("day_us"),
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        dayofweek(col("ts")).cast("long").as("dow"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long").as("days_since"))
      .orderBy("event_id")

  /** Discount math — per-row double ops are bit-identical across engines. */
  def scalarMath(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        Exact.r2(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("net"),
        abs(col("l_discount") - 0.05).as("adisc"),
        ceil(col("l_extendedprice")).as("cprice"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")

  /** JSON extraction from `events.props` (shape {"k": <int>}). */
  def scalarJson(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")

  /** VARIANT semi-structured access (Spark 4's open JSON type): parse the
    * props JSON once into a variant, extract a typed path, report the
    * inferred schema, and show `try_parse_json` absorbing malformed input
    * as null instead of failing the query. Against a 100 TB semi-structured
    * lake, VARIANT's binary encoding replaces per-query string re-parsing
    * (`get_json_object` re-tokenizes the text every call) with one decode
    * at ingest and typed field reads after — the shredded-columnar path.
    */
  def scalarVariant(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"), parse_json(col("props")).as("v"))
      .select(col("event_id"),
        variant_get(col("v"), "$.k", "long").as("k"),
        schema_of_variant(col("v")).as("vschema"),
        is_variant_null(col("v")).as("v_is_null"),
        variant_get(try_parse_json(lit("{not json")), "$.k", "long").as("bad"))
      .orderBy("event_id")

  /** Collated string semantics (Spark 4 collation support): the same
    * comparison under binary vs UTF8_LCASE collation. Mixed-case input is
    * synthesized deterministically (even keys lowercase their segment), and
    * the collated equality/prefix tests diverge from binary exactly on the
    * case-mangled rows. At scale, collation beats `lower()`-wrapping because
    * the comparison keeps its data type (sort keys, join keys, and GROUP BY
    * stay collated strings — no derived column to maintain).
    */
  def scalarCollation(spark: SparkSession, dir: String): DataFrame = {
    val mixed = when(col("c_custkey") % 2 === 0, lower(col("c_mktsegment")))
      .otherwise(col("c_mktsegment"))
    t(spark, dir, "customer")
      .select(col("c_custkey"), mixed.as("seg_mixed"))
      .select(col("c_custkey"), col("seg_mixed"),
        (collate(col("seg_mixed"), "UTF8_LCASE") === lit("bUiLdInG")).as("eq_lcase"),
        (col("seg_mixed") === "BUILDING").as("eq_binary"),
        startswith(collate(col("seg_mixed"), "UTF8_LCASE"), lit("BUILD")).as("pfx_lcase"))
      .orderBy("c_custkey")
  }

  /** Regex functions: extract the numeric suffix of c_name, split-part-style
    * token access, and a match flag.
    */
  def scalarRegex(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .select(col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)$", 1).as("num_suffix"),
        element_at(split(col("c_name"), "#"), 1).as("name_head"),
        col("c_name").rlike("^Customer").as("is_customer"))
      .orderBy("c_custkey")

  /** Conditional expressions: CASE WHEN tiers, nullif/coalesce, least/greatest. */
  def scalarConditional(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderkey"),
        when(col("o_totalprice") >= 200000, "high")
          .when(col("o_totalprice") >= 100000, "mid")
          .otherwise("low").as("tier"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_alias"),
        least(col("o_totalprice"), lit(150000.0)).as("capped"),
        greatest(col("o_totalprice"), lit(1000.0)).as("floored"))
      .orderBy("o_orderkey")

  /** Cast matrix: number↔string, timestamp→date→string round-trips. */
  def scalarCasts(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"),
        col("event_id").cast("string").as("id_str"),
        col("value").cast("int").as("value_int"),
        concat(col("user_id").cast("string"), lit("#"), col("event_type")).as("composite"),
        to_date(col("ts")).cast("string").as("day_str"))
      .orderBy("event_id")

  /** Higher-order array functions over embeddings: size, element access, and
    * an `aggregate`-built L2 norm — all codegen-friendly, no UDFs. DuckDB
    * oracle: list_sum(list_transform(...)) folds sequentially in double like
    * Spark's `aggregate` (verified bit-identical over the fixture), so this
    * IS oracle-checkable despite the float math.
    */
  def scalarArray(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id"),
        size(col("embedding")).cast("long").as("dim"),
        element_at(col("embedding"), 1).as("first"),
        sqrt(aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double") * x.cast("double"))).as("l2_norm"))
      .orderBy("vec_id")

  /** Bitwise scalar surface: and/or/xor, shifts, popcount — all codegen'd
    * integer ops that run at scan speed.
    */
  def scalarBitwise(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"),
        col("event_id").bitwiseAND(255).as("band"),
        col("event_id").bitwiseOR(4096).as("bor"),
        col("event_id").bitwiseXOR(col("user_id")).as("bxor"),
        shiftleft(col("event_id"), 2).as("shl"),
        shiftright(col("event_id"), 3).as("shr"),
        bit_count(col("event_id")).cast("long").as("bits"))
      .orderBy("event_id")

  /** Map-typed column surface: parse the JSON props into map<string,long>,
    * then key inspection / lookup / concat — the dynamic-schema counterpart
    * of scalar_json's fixed-path extraction.
    */
  def scalarMap(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.LongType)).as("m"))
      .select(col("event_id"),
        size(map_keys(col("m"))).cast("long").as("n_keys"),
        element_at(col("m"), "k").as("k_val"),
        map_contains_key(col("m"), "k").as("has_k"))
      .orderBy("event_id")

  /** Hash / encoding scalar family: md5 content hashes (lowercase hex both
    * engines), RFC-4648 base64, uppercase hex of UTF-8 bytes, zero-padding.
    */
  def scalarHashEncode(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .select(col("c_custkey"),
        md5(col("c_name").cast("binary")).as("name_md5"),
        base64(col("c_name").cast("binary")).as("name_b64"),
        hex(col("c_name").cast("binary")).as("name_hex"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        rtrim(ltrim(concat(lit("  "), col("c_mktsegment"), lit("  ")))).as("trimmed"))
      .orderBy("c_custkey")

  /** Nested-array structure ops (flatten / reverse) projected to scalars —
    * the remaining array-manipulation surface beyond scalar_array's HOFs.
    */
  def scalarArrayExtras(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id"),
        size(flatten(array(col("embedding"), col("embedding")))).cast("long").as("flat_len"),
        element_at(reverse(col("embedding")), 1).as("rev_first"),
        element_at(col("embedding"), 64).as("last_elem"))
      .orderBy("vec_id")

  /** Higher-order array functions as first-class scalars: lambda filter
    * (count of long tokens), lambda transform feeding a left-fold aggregate
    * (total characters — exact integer fold, sequential on both engines),
    * and transform-over-slice (uppercased 3-token head). The functional
    * surface that replaces per-row UDFs with codegen-friendly Catalyst
    * lambda expressions — all partition-local, zero shuffle.
    */
  def scalarHigherOrder(spark: SparkSession, dir: String): DataFrame = {
    val ss = split(col("text"), " ")
    t(spark, dir, "documents")
      .select(col("doc_id"),
        size(filter(ss, x => length(x) > 4)).cast("long").as("n_long_tokens"),
        aggregate(transform(ss, x => length(x).cast("long")), lit(0L),
          (a, b) => a + b).as("total_chars"),
        array_join(transform(slice(ss, 1, 3), x => upper(x)), "|").as("head_upper"))
      .orderBy("doc_id")
  }

  /** Generator over a map column: each (key, value) entry becomes a row —
    * the map-typed counterpart of explode-over-arrays (dynamic-schema
    * flattening of JSON properties into relational rows).
    */
  def generatorExplodeMap(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"),
        explode(from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.LongType))).as(Seq("key", "val")))
      .orderBy("event_id", "key")

  /** Edit-distance scalar (levenshtein) — the exact verify-stage of fuzzy
    * entity matching (blocking/LSH proposes candidate pairs, edit distance
    * disposes — same propose/dispose shape as the dedup operators).
    */
  def scalarLevenshtein(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .select(col("c_custkey"),
        levenshtein(col("c_name"), lit("Customer#000000000")).cast("long").as("dist_probe"),
        levenshtein(col("c_name"), upper(col("c_name"))).cast("long").as("dist_case"))
      .orderBy("c_custkey")

  /** ANSI-safe error handling: try_divide / try_cast return NULL instead of
    * failing the job — the difference between one malformed row poisoning a
    * 100 TB batch and a quarantine-able null.
    */
  def scalarTrySafe(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"),
        try_divide(col("value"), (col("user_id") % 3).cast("double")).as("safe_div"),
        col("event_type").try_cast("bigint").as("bad_cast"),
        col("event_id").cast("string").try_cast("bigint").as("good_cast"))
      .orderBy("event_id")

  /** Data-lineage provenance: which file each row came from
    * (input_file_name), rolled up per file — the scan-level audit a lake
    * pipeline runs after every ingest.
    */
  def scanFileProvenance(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(regexp_extract(input_file_name(), "([^/]+)$", 1).as("file"))
      .groupBy("file").agg(count(lit(1)).as("cnt"))
      .orderBy("file")

  /** URL parsing/encoding scalars (parse_url / url_encode / url_decode) —
    * the clickstream-normalization family (canonicalize landing URLs, split
    * host/path, pull campaign params). URLs are synthesized deterministically
    * from customer columns; the name travels url-encoded and is decoded back
    * out of the parsed query param, closing the encode→embed→parse→decode
    * loop in one plan. All codegen'd built-ins — no UDF.
    *
    * ORACLE CONTRACT: c_name is 'Customer#NNNNNNNNN' — '#' is the only
    * character java.net.URLEncoder rewrites, so the DuckDB oracle (no
    * url_encode in DuckDB 1.0) reproduces the encoding with
    * replace(c_name,'#','%23') and parses with regexp_extract.
    */
  /** IPv4 inet arithmetic (the ClickHouse `IPv4NumToString` /
    * `IPv4StringToNum` / range-membership family, which Spark has no
    * built-ins for — expressed in pure integer/string ops that any engine
    * reproduces bit-for-bit): a deterministic test address per customer
    * (Fibonacci-hash of the key), rendered dotted-quad, parsed BACK to its
    * number (the round trip is the correctness claim), RFC-1918
    * private-range classification, and /8 membership — the
    * subnet-aggregation building block of every clickstream geo/abuse
    * report. Octet math is `div`/`%` on int64 only.
    *
    * Scale: pure per-row map; no shuffle but the output ordering.
    */
  def scalarInet(spark: SparkSession, dir: String): DataFrame = {
    val oct = split(col("ip"), "\\.")
    t(spark, dir, "customer")
      .select(col("c_custkey"),
        ((col("c_custkey") * lit(2654435761L)) % lit(4294967296L)).as("ipn"))
      .select(col("c_custkey"), col("ipn"),
        concat_ws(".", expr("ipn div 16777216"), expr("(ipn div 65536) % 256"),
          expr("(ipn div 256) % 256"), expr("ipn % 256")).as("ip"))
      .select(col("c_custkey"), col("ip"),
        (oct.getItem(0).cast("long") * 16777216 + oct.getItem(1).cast("long") * 65536 +
          oct.getItem(2).cast("long") * 256 + oct.getItem(3).cast("long")).as("ip_num"),
        (oct.getItem(0).cast("long") === 10 ||
          (oct.getItem(0).cast("long") === 172 &&
            oct.getItem(1).cast("long").between(16, 31)) ||
          (oct.getItem(0).cast("long") === 192 &&
            oct.getItem(1).cast("long") === 168)).as("is_private"),
        (expr("ipn div 16777216") === 10).as("in_10_8"))
      .orderBy("c_custkey")
  }

  def scalarUrl(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        concat(lit("https://shop.example.com/seg/"), lower(col("c_mktsegment")),
          lit("/profile?id="), col("c_custkey").cast("string"),
          lit("&name="), url_encode(col("c_name"))).as("url"))
      .select(col("c_custkey"), col("url"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query"),
        parse_url(col("url"), lit("QUERY"), lit("id")).as("id_param"),
        url_decode(parse_url(col("url"), lit("QUERY"), lit("name"))).as("name_decoded"))
      .orderBy("c_custkey")

  /** Day-granular interval arithmetic: datediff against an anchor date,
    * date_add/date_sub offsets, month truncation — the retention/cohort
    * scalar family. Month-fraction arithmetic (months_between) is excluded
    * on purpose: it returns engine-specific fractional conventions.
    */
  def scalarInterval(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderkey"),
        datediff(lit("1998-12-01").cast("date"), col("o_orderdate")).cast("long").as("age_days"),
        date_add(col("o_orderdate"), 30).cast("string").as("due30"),
        date_sub(col("o_orderdate"), 7).cast("string").as("minus7"),
        trunc(col("o_orderdate"), "month").cast("string").as("month_start"))
      .orderBy("o_orderkey")

  /** Calendar arithmetic beyond scalar_date: month addition with end-of-month
    * clamping, last_day, quarter/day-of-year/ISO-week extraction.
    */
  def scalarDatetimeExtras(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderkey"),
        add_months(col("o_orderdate"), 3).cast("string").as("plus3m"),
        last_day(col("o_orderdate")).cast("string").as("month_end"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        weekofyear(col("o_orderdate")).cast("long").as("woy"))
      .orderBy("o_orderkey")
}
