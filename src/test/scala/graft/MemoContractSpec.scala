package graft

/** Pins [[Tables.sessionCache]]'s immutability contract and its escape
  * hatch: a memoized RAW read is a plan (re-listed at execution — appends
  * show through), while driver-side derived results are frozen at first
  * use. A dir mutated in place therefore serves an incoherent composite
  * view by design until [[Tables.invalidate]] evicts every module's
  * entries for it.
  */
class MemoContractSpec extends SparkSpec {

  import spark.implicits._

  test("mutated dir: derived memos stay frozen and the composite view is incoherent until invalidate(dir)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-memo").toString
    Seq((0L, "en", "alpha beta"), (1L, "en", "gamma delta"))
      .toDF("doc_id", "lang", "text")
      .write.parquet(s"$dir/documents.parquet")
    Seq((0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)), (1L, Seq(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .write.parquet(s"$dir/embeddings.parquet")

    assert(Tables.t(spark, dir, "documents").count() == 2)
    // Prime a DRIVER-SIDE derived memo in another module: k=1, iters=1 →
    // the single centroid is the mean of all vectors.
    val c0 = graft.ops.LlmPipeline.kMeansCentroids(spark, dir, k = 1, iters = 1)
    assert(math.abs(c0.head.head - 0.5) < 1e-9, s"centroid: $c0")

    // Mutate the dir in place — the case the contract documents.
    Seq((2L, "fr", "epsilon zeta")).toDF("doc_id", "lang", "text")
      .write.mode("append").parquet(s"$dir/documents.parquet")
    Seq((2L, Seq(0.0f, 0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
      .write.mode("append").parquet(s"$dir/embeddings.parquet")

    // CONTRACT, layer 1: the memoized raw read is a PLAN — whether it
    // serves the stale listing (2) or re-lists and sees the append (3) is
    // nondeterministic under mutation; the contract promises nothing here.
    val staleWindow = Tables.t(spark, dir, "documents").count()
    assert(staleWindow == 2 || staleWindow == 3, s"raw read saw $staleWindow rows")
    // Layer 2: the driver-side derived result is FROZEN at first use —
    // the incoherent composite view the contract warns about.
    val cStale = graft.ops.LlmPipeline.kMeansCentroids(spark, dir, k = 1, iters = 1)
    assert(cStale == c0, "driver-side derived results stay frozen")

    // ESCAPE HATCH: invalidate evicts every module's entries for the dir —
    // the next access re-derives and the view is coherent again (the
    // centroid is now the mean of THREE vectors).
    Tables.invalidate(spark, dir)
    assert(Tables.t(spark, dir, "documents").count() == 3)
    val cFresh = graft.ops.LlmPipeline.kMeansCentroids(spark, dir, k = 1, iters = 1)
    assert(math.abs(cFresh.head.head - 1.0 / 3.0) < 1e-9,
      s"post-invalidate centroid must cover the appended vector: $cFresh")

    // Scoped eviction: other dirs' memos are untouched (the shared fixture
    // keeps serving without a re-read).
    assert(Tables.t(spark, sf, "documents").count() > 0)
  }
}
