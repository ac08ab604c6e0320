package graft.ops

import graft.Tables.t
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in partition-local batches. The real decode libraries
  * (image/audio codecs) are not in this container, so the decode step is a
  * clearly-marked deterministic STUB — but the Spark-side contract (schema,
  * binary column handling, batch iteration shape, partitioning) is real and
  * tested. On a cluster you'd swap [[stubDecode]] for a JNI/libjpeg call (or,
  * in PySpark, a Pandas UDF over `mapInPandas` with the same row contract).
  *
  * Scale: media bytes stay partition-local end-to-end — nothing below
  * shuffles the binary payload; only extracted (small) features move.
  */
object Multimodal {

  /** Media asset row: opaque payload + typed metadata, the schema a media
    * lake table would have.
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType),
      StructField("declared_len", LongType))), nullable = true)))

  /** Build a media table from `documents` (the container has no real media
    * files): payload = UTF-8 bytes of the text, metadata carries the declared
    * kind/length. Deterministic, so oracle-checkable.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(lit("text").as("kind"), col("n_chars").as("declared_len")).as("meta"))

  /** Content fingerprint + byte length — pure codegen'd expressions over the
    * binary column (sha2 works on BinaryType directly).
    */
  def multimodalFingerprint(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("asset_id"),
        length(col("media")).cast("long").as("byte_len"),
        sha2(col("media"), 256).as("fingerprint"),
        col("meta.kind").as("kind"))
      .orderBy("asset_id")

  /** STUB "decode": a stand-in for an image/audio decoder. Derives
    * deterministic fake features from the payload bytes (as a real decoder
    * would derive width/height/duration). Marked clearly; swap for a real
    * codec at deployment.
    */
  def stubDecode(payload: Array[Byte]): (Int, Int, Double) = {
    // ??? real decoder goes here; deterministic fake below keeps tests stable.
    val h = java.util.Arrays.hashCode(payload)
    val w = math.floorMod(h, 1920) + 1
    val ht = math.floorMod(h / 1920, 1080) + 1
    (w, ht, payload.length / 1000.0)
  }

  /** STUB "resize": a decoded image would be scaled to targetW×targetH; the
    * stand-in down-samples the payload bytes at the equivalent stride so the
    * output size contract (≤ target "pixels") is real.
    */
  def stubResize(payload: Array[Byte], targetLen: Int): Array[Byte] = {
    // ??? real scaler goes here; deterministic stride-sample below.
    if (payload.length <= targetLen) payload
    else {
      val stride = payload.length.toDouble / targetLen
      Array.tabulate(targetLen)(i => payload((i * stride).toInt))
    }
  }

  /** Partition-local batch "decode" via mapPartitions — the Scala analogue of
    * `mapInPandas`: one iterator per partition, media bytes never shuffled,
    * output is the small feature row. The pipeline per asset:
    * decode (stub) → resize to a bounded thumbnail → frame-sample at a fixed
    * stride — the real shapes of an image/video featurization pass.
    */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_s", DoubleType),
      StructField("n_frames_sampled", IntegerType),
      StructField("thumb_len", IntegerType),
      StructField("thumb_fingerprint", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    mediaTable(spark, dir)
      .select(col("asset_id"), col("media"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getAs[Array[Byte]](1)
          val (w, h, d) = stubDecode(payload)
          val thumb = stubResize(payload, 128)
          val frames = math.max(1, payload.length / 256) // stride "frame sample"
          Row(id, w, h, d, frames, thumb.length,
            java.util.Arrays.hashCode(thumb).toLong)
        }
      }(enc)
      .orderBy("asset_id")
  }
}
