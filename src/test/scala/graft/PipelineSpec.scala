package graft

import scala.util.{Failure, Success}

import graft.extract.{Extractor, ExtractorRegistry, FileWatermarkStore, Pipeline}
import graft.model._

/** Orchestration layer (reference A17 registry + A19 pass_on_error + the §3
  * framework lifecycle): variants resolve, watermarks persist across runs,
  * failures skip-or-propagate per table config.
  */
class PipelineSpec extends SparkSpec {

  private val incrId = TableConfig("events",
    replicationMethod = ReplicationMethod.Incremental,
    iterateColumn = Some("event_id"), iterateColumnType = IterateType.IntCol)

  test("registry resolves the parquet variant and rejects unknown ones") {
    assert(ExtractorRegistry("parquet")(sf).isInstanceOf[Extractor])
    intercept[IllegalArgumentException] { ExtractorRegistry("clickhouse") }
    ExtractorRegistry.register("clickhouse", dir => new Extractor(dir))
    assert(ExtractorRegistry.variants.contains("clickhouse"))
  }

  test("pipeline run persists watermarks and second run appends only the boundary row") {
    val wmPath = java.nio.file.Files.createTempFile("graft-wm", ".properties")
    val store = new FileWatermarkStore(wmPath)
    val out = java.nio.file.Files.createTempDirectory("graft-pipe").toString
    val pipe = new Pipeline(new Extractor(sf), store)

    val run1 = pipe.run(spark, Seq(incrId), out)
    assert(run1.head._2.isSuccess)
    assert(store.get("events").contains("999")) // max(event_id) at sf0.001

    // A fresh pipeline over the same store (new process simulation): the
    // inclusive watermark re-extracts exactly the boundary row, append mode.
    val run2 = new Pipeline(new Extractor(sf), store).run(spark, Seq(incrId), out)
    run2.head._2 match {
      case Success(r) =>
        assert(r.writeMode == org.apache.spark.sql.SaveMode.Append)
        assert(r.lastPoint.contains("999"))
      case Failure(e) => fail(e)
    }
    // Target now holds initial 1000 rows + the re-extracted boundary row.
    assert(spark.read.parquet(s"$out/events").count() == 1001)
  }

  test("passOnError=true records the failure and continues; false propagates") {
    val out = java.nio.file.Files.createTempDirectory("graft-pipe2").toString
    val pipe = new Pipeline(new Extractor(sf))
    val bad = TableConfig("no_such_table", passOnError = true)
    val results = pipe.run(spark, Seq(bad, TableConfig("nation")), out)
    assert(results.head._2.isFailure)
    assert(results(1)._2.isSuccess)
    intercept[Exception] {
      pipe.run(spark, Seq(bad.copy(passOnError = false)), out)
    }
  }
}
