package graft

import org.apache.spark.sql.functions._

import graft.ops.LlmPipeline

/** The single-read audit of every query WITHOUT a DuckDB oracle: each entry
  * states why no SQL oracle can exist and names the scalatest(s) that pin its
  * semantics instead. The audit is MACHINE-CHECKED, not prose: the no-oracle
  * set is derived from `SparkEntry.queries -- SparkEntry.oracleSql` and must
  * equal this table exactly (a new oracle-less query fails here until it is
  * pinned), and every referenced test name must exist in its suite.
  */
class UnoracleableSpec extends SparkSpec {

  /** why: one-line reason no DuckDB oracle exists; suite→tests: the pins. */
  final case class Pin(why: String, suite: String, tests: Seq[String])

  val pins: Map[String, Pin] = Map(
    "agg_approx_distinct" -> Pin(
      "HLL++ estimate is engine-specific (Spark's sketch ≠ DuckDB's)",
      "OpsSpec", Seq("agg_approx_distinct within 5% rsd tolerance of exact")),
    "agg_approx_percentiles" -> Pin(
      "KLL/GK approx quantiles are engine-specific",
      "OpsSpec", Seq("approx_percentile within tolerance of exact percentiles")),
    "agg_hll_sketch" -> Pin(
      "Datasketches HLL binary sketches have no DuckDB counterpart",
      "OpsSpec", Seq("hll sketch: estimate within tolerance; per-group sketches merge to the global estimate")),
    "dedup_near_minhash" -> Pin(
      "candidate set depends on MinHash permutation seeds (no SQL equivalent)",
      "OpsSpec", Seq(
        "minhash LSH: exact duplicate texts get est_jaccard 1.0; pairs are canonical",
        "hot LSH bucket guard: 1k identical docs yield O(b) star-linked pairs, not O(b²)",
        "LSH bucket guard boundary: buckets at the threshold keep exact all-pairs semantics")),
    "dedup_ngram_jaccard" -> Pin(
      "verify stage consumes the seed-dependent LSH candidate set",
      "OpsSpec", Seq("ngram jaccard verify-stage: exact dups 1.0, near dups high, est ≈ true")),
    "dedup_near_embedding" -> Pin(
      "SRP sign-code buckets depend on fixed random hyperplanes",
      "OpsSpec", Seq("embedding near-dup SRP LSH: identical vectors collide at cosine 1.0; no self pairs")),
    "text_fingerprint" -> Pin(
      "SimHash64 is this engine's own fingerprint function",
      "OpsSpec", Seq("simhash fingerprints: identical text → identical hash; determinism")),
    "text_heavy_hitters" -> Pin(
      "CMS estimates are sketch-construction-specific (DuckDB has no CMS)",
      "OpsSpec", Seq(
        "count-min sketch heavy hitters: sketch-first estimates bound exact counts within eps·N",
        "heavy hitters: a genuinely hot term tops the sketch ranking on a skewed corpus")),
    "sim_topk_cosine" -> Pin(
      "DuckDB list_dot_product folds in a different order → float drift (memory: graft-harness-gotchas)",
      "OpsSpec", Seq("sim_topk_cosine matches driver-side brute force")),
    "sim_topk_ivf" -> Pin(
      "ANN cell pruning + float cosine; pinned against its own brute force",
      "OpsSpec", Seq("sim_topk_ivf with all cells probed equals brute force; pruned is a valid subsearch")),
    "multimodal_decode" -> Pin(
      "decoder stubs are engine-defined (no codec libs in sandbox)",
      "OpsSpec", Seq("multimodal: fingerprint matches payload bytes; decode features deterministic")),
    "multimodal_decode_mixed" -> Pin(
      "kind-dispatched decoder stubs, as above",
      "OpsSpec", Seq("mixed-kind media: kind dispatch routes decoders; features match per-kind stubs")),
    "curation_pipeline" -> Pin(
      "composes the seed-dependent near-dup stage",
      "UnoracleableSpec", Seq(
        "curation_pipeline invariants: unique survivors, losers dropped, quality gate honored")))

  test("no-oracle queries ↔ pinned tests is exactly 1:1, and every pinned test exists") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == pins.keySet,
      s"unpinned: ${(noOracle -- pins.keySet).toSeq.sorted}; stale pins: ${(pins.keySet -- noOracle).toSeq.sorted}")
    val suites: Map[String, Set[String]] = Map(
      "OpsSpec" -> new OpsSpec().testNames,
      "UnoracleableSpec" -> this.testNames)
    for ((q, pin) <- pins; t <- pin.tests)
      assert(suites(pin.suite).contains(t), s"$q pins missing test '$t' in ${pin.suite}")
  }

  test("curation_pipeline invariants: unique survivors, losers dropped, quality gate honored") {
    val out = LlmPipeline.curationPipeline(spark, sf).collect()
    val ids = out.map(_.getLong(0))
    assert(ids.nonEmpty && ids.distinct.length == ids.length, "survivors must be unique")

    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ids.forall(docs.contains), "survivors must come from the corpus")

    // Exact-dedup contract: for every distinct text, only the min doc_id may
    // survive — so no two survivors share a text, and each survivor is its
    // text's representative.
    val minByText = docs.groupBy(_._2).map { case (_, rs) => rs.map(_._1).min }.toSet
    assert(ids.forall(minByText.contains),
      s"non-representative survivors: ${ids.filterNot(minByText.contains).take(5).toSeq}")

    // Near-dup contract: no confirmed near-dup loser (doc_b) survives.
    val nearLosers = LlmPipeline.dedupNearMinhash(spark, sf)
      .select("doc_b").collect().map(_.getLong(0)).toSet
    assert(ids.forall(!nearLosers.contains(_)), "near-dup loser survived")

    // Quality gate: emitted stats honor the filter, and n_words matches a
    // driver-side recount of the surviving text.
    for (r <- out) {
      val (id, nWords) = (r.getLong(0), r.getLong(2))
      assert(nWords >= 10, s"doc $id below word gate: $nWords")
      assert(nWords == docs(id).split(" ").length.toLong,
        s"doc $id n_words $nWords != recount")
    }
  }
}
