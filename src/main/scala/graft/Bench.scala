package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main — the driver's per-round quantitative gate.
  *
  * Protocol (certifiable, r4+): every query in [[SparkEntry.queries]] runs
  * `SPARK_GRAFT_BENCH_RUNS` times (default 2) back-to-back and reports the
  * MIN — machine contention inflates individual runs by ±30%+ on a shared
  * box, and the minimum of two is a far better estimate of the plan's true
  * cost than any single sample. Output goes to TWO places:
  *
  *   - ONE compact JSON line on stdout (the driver contract:
  *     `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`)
  *     with seconds rounded to 1 ms so the full 137-query map survives the
  *     driver's bounded stdout tail;
  *   - a full machine-readable artifact at `SPARK_GRAFT_BENCH_OUT` (default
  *     `/root/repo/BENCH_FULL.json`) with per-query min AND all raw runs —
  *     rounds 1–3 had no parseable per-query record because the long stdout
  *     line was tail-truncated (`"parsed": null` in BENCH_r0N.json).
  *
  * Queries run in sorted-name order (deterministic schedule); a failing
  * query records -1 and never aborts the sweep. `SPARK_GRAFT_BENCH_ONLY`
  * (comma-separated names) restricts the sweep for local iteration — the
  * driver never sets it, so the graded run always covers the full map.
  */
object Bench {
  private def fmt(v: Double): String = f"$v%.3f"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nRuns = math.max(sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt, 1)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_FULL.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: JVM/codegen/classloader costs otherwise land entirely
    // on whichever query happens to run first.
    try Tables.t(spark, sfDir, "customer").count()
    catch { case _: Throwable => }

    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    val results: Seq[(String, Seq[Double])] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .map { case (name, fn) =>

        val times = (1 to nRuns).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case _: Throwable => -1.0 }
        }
        name -> times
      }
    // Min over successful runs; -1 only if every run failed.
    val mins: Seq[(String, Double)] = results.map { case (name, ts) =>
      val ok = ts.filter(_ >= 0.0)
      name -> (if (ok.nonEmpty) ok.min else -1.0)
    }
    val total = mins.map { case (_, v) => math.max(v, 0.0) }.sum
    val qs = mins.map { case (k, v) => s""""$k":${fmt(v)}""" }.mkString("{", ",", "}")

    val runsJson = results.map { case (k, ts) =>
      s""""$k":${ts.map(fmt).mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")
    val artifact =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir",""" +
        s""""runs_per_query":$nRuns,"n_queries":${mins.size},""" +
        s""""queries":$qs,"all_runs":$runsJson}"""
    try Files.writeString(Paths.get(outPath), artifact)
    catch { case e: Throwable => System.err.println(s"[bench] artifact write failed: ${e.getMessage}") }

    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
