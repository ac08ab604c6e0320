package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Proves the library's one-line install path in-suite: a FRESH session built
  * with `spark.sql.extensions=graft.GraftExtensions` (extensions bind at
  * session construction, so the shared [[SparkSpec]] session cannot carry
  * them) gets the optimizer rule and all six SQL functions with zero Scala
  * imports — the contract a spark-submit user relies on. Complements
  * [[graft.ExtensionsDemo]], which proves the same from a standalone main.
  *
  * Safe to run in the shared-JVM suite: sbt runs forked suites sequentially
  * (`testForkedParallel` defaults to false), the isolated session shares the
  * JVM's SparkContext, and active/default sessions are restored in finally.
  */
class ExtensionsSpec extends AnyFunSuite {

  val sf = "/root/testdata/sf0.001"

  test("spark.sql.extensions=graft.GraftExtensions injects the rule + all 6 SQL functions") {
    val prior = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    try {
      assert(s.sessionState.conf.getConfString("spark.sql.extensions")
        == "graft.GraftExtensions")
      Tables.registerViews(s, sf, Seq("documents", "embeddings", "events"))

      // All five injected functions resolve from PURE SQL.
      val row = s.sql(
        """SELECT size(graft_minhash(text))       AS mh_len,
          |       size(graft_shingle_hashes(text)) AS sh_len,
          |       graft_token_count(text)          AS toks,
          |       graft_simhash(text)              AS sim,
          |       size(graft_rolling_fp(text))     AS rfp_len
          |FROM documents WHERE doc_id = 0""".stripMargin).head()
      assert(row.getAs[Int]("mh_len") == 64)
      assert(row.getAs[Int]("sh_len") > 0)
      assert(row.getAs[Long]("toks") > 0L)
      assert(row.getAs[Int]("rfp_len") >= 0)
      val dot = s.sql(
        "SELECT graft_dot(embedding, embedding) AS d FROM embeddings WHERE vec_id = 0")
        .head().getDouble(0)
      assert(dot > 0.0)

      // SQL bindings agree with the Scala-helper registrations (same
      // Expressions, fixed 64-hash / 3-shingle defaults).
      import org.apache.spark.sql.functions.col
      val doc0 = Tables.t(s, sf, "documents").filter(col("doc_id") === 0)
      val viaHelper = doc0.select(
        graft.functions.SimHash64.simhash(s, col("text"))).head().getLong(0)
      assert(row.getAs[Long]("sim") == viaHelper)

      // The injected optimizer rule fires: a predicate on the ns→µs derived
      // ts column reaches the parquet scan as a pushed raw-nanos filter.
      val pushed = Tables.t(s, sf, "events")
        .filter(col("ts") >=
          org.apache.spark.sql.functions.lit("2024-01-15 00:00:00").cast("timestamp"))
        .queryExecution.executedPlan.toString
      assert(pushed.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
        s"nanos pushdown rule did not fire:\n$pushed")

      // Negative control: the plain SQL names exist ONLY via the extensions —
      // helper registrations use parameter-suffixed names, so a vanilla
      // session must not resolve graft_minhash.
      prior.foreach { vanilla =>
        val err = intercept[Exception](vanilla.sql("SELECT graft_minhash('a b c d')"))
        assert(err.getMessage.contains("UNRESOLVED_ROUTINE")
          || err.getMessage.toLowerCase.contains("cannot resolve"), err.getMessage)
      }
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach { p =>
        SparkSession.setActiveSession(p)
        SparkSession.setDefaultSession(p)
      }
    }
  }
}
