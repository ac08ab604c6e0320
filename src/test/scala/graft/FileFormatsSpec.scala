package graft

import org.apache.spark.sql.functions._

import graft.sources.FileFormats

/** Source-format semantics beyond the oracle-checked round-trips: schema
  * evolution on append-style lakes (the incremental-replication reality the
  * reference's overwrite/append modes feed into — a source adding a column
  * between runs must not break or silently drop data).
  */
class FileFormatsSpec extends SparkSpec {

  import spark.implicits._

  test("parquet mergeSchema unions evolved schemas; missing columns read as null") {
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    // Run 1 writes (id, v); a later run adds a column (id, v, tag) — the
    // shape of an upstream ALTER TABLE ADD COLUMN mid-replication.
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
      .write.mode("append").parquet(dir)
    Seq((3L, 30.0, "new")).toDF("id", "v", "tag")
      .write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "tag", "v"))
    val rows = merged.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).isNullAt(rows(0).fieldIndex("tag")), "old rows surface null for the new column")
    assert(rows(2).getString(rows(2).fieldIndex("tag")) == "new")

    // Without mergeSchema the footer picked is arbitrary — pinning the
    // merged read as the engine's documented evolution contract.
    val plain = spark.read.parquet(dir)
    assert(plain.count() == 3)
  }

  test("csv/json round-trips preserve values exactly and reuse one materialized copy") {
    val a = FileFormats.scanCsvRoundtrip(spark, sf).collect()
    val b = FileFormats.scanCsvRoundtrip(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    val direct = Tables.t(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .orderBy("event_id").collect()
    assert(a.toSeq == direct.toSeq, "CSV round-trip must be value-exact")
    val j = FileFormats.scanJsonRoundtrip(spark, sf).collect()
    assert(j.toSeq == direct.toSeq, "JSON round-trip must be value-exact")
  }
}
