package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main — the driver's per-round quantitative gate.
  *
  * Protocol (contention-proofed, r5+): every query in [[SparkEntry.queries]]
  * runs `SPARK_GRAFT_BENCH_RUNS` times (default 2) back-to-back and reports
  * the MIN — machine contention inflates individual runs by ±30%+ on a
  * shared box. Min-of-2 alone is NOT enough when a contention window spans
  * both runs (round 4's recorded tail was 4–8× inflated exactly this way —
  * the slow block was the late-alphabet region of the sorted sweep, a
  * contention signature, not a plan one), so a RETRY pass follows the sweep:
  * any query whose runs disagree by more than 2× or whose min exceeds 3× the
  * median of its name-family (`agg_*`, `sql_*`, …) re-runs once more, and
  * the overall min wins. `/proc/loadavg` is sampled before and after the
  * sweep into the artifact so a contended run is self-identifying.
  *
  * Output goes to TWO places:
  *
  *   - ONE compact JSON line on stdout (the driver contract:
  *     `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`)
  *     with seconds rounded to 1 ms so the full query map survives the
  *     driver's bounded stdout tail; `n_failed` (and the failing names) ride
  *     along so a sweep with failures can never masquerade as a speedup —
  *     failed queries record -1 per query but contribute 0 to the total.
  *     `value_cold` (sum of FIRST runs) rides next to `value` (sum of mins):
  *     queries sharing memoized derived tables are steady-state-cheap, and
  *     without the cold total the min sum could be misread as cold cost.
  *   - a full machine-readable artifact at `SPARK_GRAFT_BENCH_OUT` (default
  *     `/root/repo/BENCH_FULL.json`) with per-query min, all raw runs, the
  *     retried-query list, and the loadavg samples.
  *
  * Every number is formatted with Locale.ROOT: under a JVM default locale
  * with comma decimal separators (de_DE…), `f"$v%.3f"` would emit `1,234`
  * and break every JSON consumer.
  *
  * Queries run in sorted-name order (deterministic schedule); a failing
  * query records -1 and never aborts the sweep. `SPARK_GRAFT_BENCH_ONLY`
  * (comma-separated names) restricts the sweep for local iteration — the
  * driver never sets it, so the graded run always covers the full map.
  */
object Bench {
  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  private def loadavg(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ").take(3).mkString(" ")
    catch { case _: Throwable => "unavailable" }

  /** Median of a non-empty sequence (lower-middle for even sizes). */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s((s.size - 1) / 2)
  }

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
    val loadBefore = loadavg()
    // Untimed warm-up: JVM/codegen/classloader costs otherwise land entirely
    // on whichever query happens to run first.
    try Tables.t(spark, sfDir, "customer").count()
    catch { case _: Throwable => }

    def run1(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case _: Throwable => -1.0 }
    }

    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    val swept: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
    val firstPass: Seq[(String, Seq[Double])] =
      swept.map { case (name, fn) => name -> (1 to nRuns).map(_ => run1(fn)) }

    // Retry pass: a query whose successful runs disagree >2× was measured
    // through at least one contention spike; one whose min is >3× its
    // name-family median (and not trivially fast) is suspect even if both
    // runs landed inside the same spike. Sub-0.2s disagreements are codegen/
    // GC noise on trivial queries — not worth a retry.
    def familyOf(name: String): String = name.takeWhile(_ != '_')
    val famMedian: Map[String, Double] = firstPass
      .flatMap { case (n, ts) =>
        val ok = ts.filter(_ >= 0.0)
        if (ok.isEmpty) None else Some(familyOf(n) -> ok.min)
      }
      .groupBy(_._1).map { case (f, xs) => f -> median(xs.map(_._2)) }
    val retried: Seq[String] = firstPass.collect {
      case (n, ts) if {
        val ok = ts.filter(_ >= 0.0)
        ok.nonEmpty && (
          (ok.max / math.max(ok.min, 1e-9) > 2.0 && ok.max > 0.2) ||
          (ok.min > 3.0 * famMedian(familyOf(n)) && ok.min > 0.5))
      } => n
    }
    val retries: Map[String, Double] = retried.map { n =>
      n -> run1(swept.find(_._1 == n).get._2)
    }.toMap

    val results: Seq[(String, Seq[Double])] = firstPass.map { case (n, ts) =>
      n -> (ts ++ retries.get(n).toSeq)
    }
    // Min over successful runs; -1 only if every run failed.
    val mins: Seq[(String, Double)] = results.map { case (name, ts) =>
      val ok = ts.filter(_ >= 0.0)
      name -> (if (ok.nonEmpty) ok.min else -1.0)
    }
    val failed = mins.collect { case (n, v) if v < 0.0 => n }
    val total = mins.map { case (_, v) => math.max(v, 0.0) }.sum
    // Cold total = sum of each query's FIRST run. Several queries share
    // memoized derived tables (cluster labels, token table, IVF index), so
    // their min-of-N measures the steady-state consume-many path; the first
    // run carries the build cost. Reporting both keeps the headline honest:
    // `value` is steady-state, `value_cold` is what a cold session pays.
    val totalCold = results.map { case (_, ts) =>
      ts.headOption.filter(_ >= 0.0).getOrElse(0.0)
    }.sum
    val qs = mins.map { case (k, v) => s""""$k":${fmt(v)}""" }.mkString("{", ",", "}")
    val failedJson = failed.map(n => s""""$n"""").mkString("[", ",", "]")
    val retriedJson = retried.map(n => s""""$n"""").mkString("[", ",", "]")

    val loadAfter = loadavg()
    val runsJson = results.map { case (k, ts) =>
      s""""$k":${ts.map(fmt).mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")
    val artifact =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir",""" +
        s""""value_cold":${fmt(totalCold)},""" +
        s""""runs_per_query":$nRuns,"n_queries":${mins.size},""" +
        s""""n_failed":${failed.size},"failed":$failedJson,"retried":$retriedJson,""" +
        s""""loadavg_before":"$loadBefore","loadavg_after":"$loadAfter",""" +
        s""""queries":$qs,"all_runs":$runsJson}"""
    try Files.writeString(Paths.get(outPath), artifact)
    catch { case e: Throwable => System.err.println(s"[bench] artifact write failed: ${e.getMessage}") }

    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","value_cold":${fmt(totalCold)},"n_failed":${failed.size},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
