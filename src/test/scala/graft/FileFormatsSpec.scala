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

  test("z-order layout: min/max pruning scans strictly fewer files than the linear layout under a 2-D predicate") {
    val rows = FileFormats.layoutZorderStats(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val (linFiles, linScanned) = rows("linear")
    val (zFiles, zScanned) = rows("zorder")
    assert(linFiles == 8 && zFiles == 8)
    // The insert-order layout has useless (user, value) bounds per file —
    // every file overlaps the box; the z-curve clusters both dims at once.
    assert(zScanned < linScanned,
      s"z-order must skip files: z=$zScanned vs linear=$linScanned")
    assert(zScanned <= linScanned / 2,
      s"z-order skipping collapsed: z=$zScanned of $zFiles (measured 3/8 on the fixture)")
    // Both layouts hold the identical relation.
    val (linear, zorder) = FileFormats.zorderLayouts(spark, sf)
    val a = spark.read.parquet(linear).orderBy("event_id").collect()
    val b = spark.read.parquet(zorder).orderBy("event_id").collect()
    assert(a.toSeq == b.toSeq, "layouts must hold the same rows")
    // Morton interleave sanity: bit i of a → 2i+1, bit i of b → 2i.
    import org.apache.spark.sql.functions.lit
    val z = spark.range(1)
      .select(FileFormats.zValue16(lit(0xFFFFL), lit(0L)).as("za"),
        FileFormats.zValue16(lit(0L), lit(0xFFFFL)).as("zb"),
        FileFormats.zValue16(lit(0xFFFFL), lit(0xFFFFL)).as("zab"))
      .head()
    assert(z.getLong(0) == 0xAAAAAAAAL && z.getLong(1) == 0x55555555L &&
      z.getLong(2) == 0xFFFFFFFFL)
  }
}
