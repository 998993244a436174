package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus partition-wise batched
  * feature extraction.
  *
  * The Spark-side machinery here is real and tested — schema, batch
  * shape, partitioning, deterministic fake features. The actual media
  * decode is STUBBED (`decodeStub`): this container has no image/audio
  * codecs, so decode produces a deterministic fake derived from the
  * bytes; swap `decodeStub` for a real codec call (e.g. javacv /
  * TwelveMonkeys inside `mapPartitions`, or a Python `mapInPandas`
  * stage in a PySpark deployment) without touching any other part of
  * the plan.
  */
object Multimodal {

  /** A multimodal record: opaque payload + typed metadata. */
  final case class MediaRecord(
      doc_id: Long,
      media_type: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int)

  /** Extracted features per record (fixed-width embedding). */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      payload_bytes: Int,
      features: Array[Float])

  /** Build a multimodal table from the documents corpus: the UTF-8
    * bytes of `text` stand in for a media payload; metadata is derived
    * deterministically from doc_id. (In production this column comes
    * off the lake as real image/audio bytes; everything downstream is
    * agnostic to that.)
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      (pmod(col("doc_id"), lit(4)) * 256 + 256).cast(IntegerType).as("width"),
      (pmod(col("doc_id"), lit(3)) * 256 + 256).cast(IntegerType).as("height"),
      lit(16000).as("sample_rate"))

  private val FeatureDim = 8

  /** STUB of the real media decode: deterministic fake features from
    * the payload bytes (seeded by content hash). A real deployment
    * replaces ONLY this function with a codec call — signature and
    * batch shape stay identical.
    *
    * The content hash is the md5-60-bit construction (top 15 hex digits
    * of md5(payload), parsed base-16 — bit-identical to
    * `conv(substr(md5(x),1,15),16,10)` in SQL on either engine), so the
    * emitted feature VALUES are recomputable in the DuckDB oracle: the
    * raw feature surface gets a value-level check, not just the
    * plumbing gate.
    */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    // ??? — real image/audio decode goes here; deterministic fake:
    val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (md(i) & 0xffL); i += 1 }
    h = h >>> 4 // top 60 bits == first 15 hex digits of the md5 string
    Array.tabulate(FeatureDim) { i =>
      val x = h ^ (0x9E3779B97F4A7C15L * (i + 1))
      ((x >>> 11).toDouble / (1L << 53).toDouble).toFloat
    }
  }

  /** Partition-wise batched feature extraction — the Scala analog of a
    * `mapInPandas` stage: rows stream through each partition in batches
    * of `batchSize` (the shape a vectorized decoder / GPU featurizer
    * wants), never materializing a partition in memory. Partitioning,
    * schema and batch shape are real; only [[decodeStub]] is fake.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // batch boundary = where a vectorized decoder would be invoked
          batch.map { case (id, mt, payload) =>
            MediaFeatures(id, mt, payload.length, decodeStub(payload))
          }
        }
      }
  }

  /** Declarative metadata/feature summary (no mapPartitions — stays in
    * whole-stage codegen): payload size, a content crc, pixel count.
    */
  def mediaStats(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"), col("media_type"),
      length(col("payload")).as("payload_bytes"),
      crc32(col("payload")).as("payload_crc"),
      (col("width").cast(LongType) * col("height")).as("n_pixels"))

  /** Frame sampling: treat the payload as `frameBytes`-sized frames and
    * keep every `stride`-th one — the Spark-side plumbing of video
    * frame-sampling (explode to one row per sampled frame; a real
    * pipeline swaps the byte-slice for a decoded frame). Row explosion,
    * offsets, and ordering are the real, tested machinery; `substring`
    * on binary is codegen'd.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    val nFrames = ceil(length(col("payload")).cast(DoubleType) / frameBytes)
      .cast(IntegerType)
    media
      .withColumn("frame_idx",
        // empty payload ⇒ zero frames (explode of an empty array drops
        // the row), not a phantom frame 0
        explode(when(nFrames > 0,
          sequence(lit(0), nFrames - 1, lit(stride)))
          .otherwise(array().cast(ArrayType(IntegerType)))))
      .select(col("doc_id"), col("media_type"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)")
          .as("frame_bytes"))
  }

  /** "Resize" metadata transform: recompute target dimensions
    * preserving aspect ratio (the metadata half of an image resize; the
    * pixel half lives behind [[extractFeatures]]'s stubbed decode).
    * Pure integer arithmetic — runs in whole-stage codegen and is
    * SQL-oracle-able.
    */
  def resizeMeta(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide.toDouble) / greatest(col("width"), col("height")))
    media.select(col("doc_id"), col("width"), col("height"),
      floor(col("width") * scale).cast(IntegerType).as("out_width"),
      floor(col("height") * scale).cast(IntegerType).as("out_height"))
  }
}
