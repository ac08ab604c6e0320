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
    val l = FileFormats.zorderLayouts(spark, sf)
    val a = spark.read.parquet(l.linear).orderBy("event_id").collect()
    val b = spark.read.parquet(l.zorder).orderBy("event_id").collect()
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

  test("hilbert layout: the continuous curve prunes at least as well as z-order, both beat linear") {
    val rows = FileFormats.layoutHilbertStats(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet == Set("hilbert", "linear", "zorder"), rows.keySet.toString)
    val (hFiles, hScanned) = rows("hilbert")
    val (_, linScanned) = rows("linear")
    val (_, zScanned) = rows("zorder")
    assert(hFiles == 8)
    assert(hScanned < linScanned,
      s"hilbert must skip files: h=$hScanned vs linear=$linScanned")
    assert(hScanned <= zScanned,
      s"the continuous curve must not prune WORSE than the teleporting one: h=$hScanned z=$zScanned")
    // The hilbert layout holds the identical relation to linear.
    val l = FileFormats.zorderLayouts(spark, sf)
    val a = spark.read.parquet(l.hilbert).orderBy("event_id").collect()
    val b = spark.read.parquet(l.linear).orderBy("event_id").collect()
    assert(a.toSeq == b.toSeq, "layouts must hold the same rows")
  }

  test("hilbert pruning advantage holds across a 3x3 sweep of box positions, not one lucky box") {
    // Per-file min/max boxes collected ONCE per layout (8 rows each — the
    // parquet-footer reader's view), then a 3x3 grid of 20%-wide predicate
    // boxes replayed against them. The aggregate ordering must hold:
    // hilbert never opens more total files than z-order, z-order fewer
    // than linear — the continuity advantage is positional-robust.
    val l = FileFormats.zorderLayouts(spark, sf)
    def bounds(path: String): Array[(Long, Long, Long, Long)] =
      FileFormats.perFileBounds(spark, path)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val layouts = Map("linear" -> bounds(l.linear), "zorder" -> bounds(l.zorder),
      "hilbert" -> bounds(l.hilbert))
    def mid(lo: Long, hi: Long, f: Double): Long = lo + ((hi - lo) * f).toLong
    val totals = layouts.map { case (name, bs) =>
      name -> (for (fu <- Seq(0.1, 0.4, 0.7); fv <- Seq(0.1, 0.4, 0.7)) yield {
        val (loU, hiU) = (mid(l.loU, l.hiU, fu), mid(l.loU, l.hiU, fu + 0.2))
        val (loV, hiV) = (mid(l.loV, l.hiV, fv), mid(l.loV, l.hiV, fv + 0.2))
        bs.count { case (flu, fhu, flv, fhv) =>
          !(fhu < loU || flu > hiU || fhv < loV || flv > hiV)
        }
      }).sum
    }
    assert(totals("hilbert") <= totals("zorder"),
      s"hilbert total ${totals("hilbert")} vs zorder ${totals("zorder")} over 9 boxes")
    assert(totals("zorder") < totals("linear"),
      s"zorder total ${totals("zorder")} vs linear ${totals("linear")} over 9 boxes")
  }

  test("hilbert curve: bijective on the grid, every step a grid neighbor, tighter than Morton") {
    import org.apache.spark.sql.functions.{col, expr}
    // Reference xy2d — the same quadrant-walk ALGORITHM transcribed in
    // test code, so this agreement check pins the codegen path against an
    // interpreted transcription (it would not catch a shared algorithmic
    // error); the INDEPENDENT proofs of the algorithm itself are the
    // bijectivity and every-step-is-a-neighbor property checks below,
    // which uniquely determine a Hilbert traversal up to orientation.
    def ref(bits: Int, x0: Long, y0: Long): Long = {
      val n = 1L << bits
      var (x, y, d) = (x0, y0, 0L)
      var s = n >> 1
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3L * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val bits = 4
    val n = 1 << bits
    import spark.implicits._
    val cells = (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
    // The codegen'd expression (DataFrame path) agrees with the reference
    // on every cell of the 16x16 grid.
    val got = cells.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.functions.HilbertIndex.hilbert(spark, col("x"), col("y"), bits).as("d"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    cells.foreach { case (x, y) =>
      assert(got((x, y)) == ref(bits, x, y), s"($x,$y)")
    }
    // Bijective: indices are exactly 0..n²−1.
    assert(got.values.toSet == (0L until (n.toLong * n)).toSet)
    // THE Hilbert property: consecutive indices are grid NEIGHBORS
    // (Manhattan distance exactly 1) — total walk length n²−1. The Morton
    // walk over the same grid teleports at every power-of-two seam, so its
    // total is strictly larger; that gap is why hilbert file boxes are
    // tighter.
    val byD = got.toSeq.map { case (xy, d) => (d, xy) }.sortBy(_._1).map(_._2)
    val hilbertWalk = byD.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
      (x1 - x2).abs + (y1 - y2).abs
    }.toSeq
    assert(hilbertWalk.forall(_ == 1L), "a Hilbert step left the neighborhood")
    def morton(x: Long, y: Long): Long =
      (0 until bits).map(i => (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))).sum
    val mortonWalk = cells.map { case (x, y) => (morton(x, y), (x, y)) }
      .sortBy(_._1).map(_._2).sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
        (x1 - x2).abs + (y1 - y2).abs
      }.toSeq
    assert(mortonWalk.sum > hilbertWalk.sum,
      s"morton total jump ${mortonWalk.sum} must exceed hilbert ${hilbertWalk.sum}")
    // Null in → null out; out-of-grid coordinates mask into the grid.
    val nullRow = Seq((Option.empty[Long], Option(1L))).toDF("x", "y")
      .select(graft.functions.HilbertIndex.hilbert(spark, col("x"), col("y"), bits).as("d"))
      .head()
    assert(nullRow.isNullAt(0))
    val masked = spark.range(1)
      .select(graft.functions.HilbertIndex.hilbert(spark,
        expr(s"cast(${n + 3} as bigint)"), expr("cast(2 as bigint)"), bits).as("d"))
      .head().getLong(0)
    assert(masked == ref(bits, 3L, 2L))
  }
}
