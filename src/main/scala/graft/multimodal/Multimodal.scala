package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A media payload: opaque bytes + typed metadata. The Spark-side contract
  * for multimodal columns — image/audio/video travel as `binary` with a
  * format tag; decode happens per partition in [[Multimodal.decodeFeatures]].
  */
final case class MediaRecord(doc_id: Long, payload: Array[Byte], format: String)

/** Features extracted from a decoded payload. */
final case class MediaFeatures(doc_id: Long, byte_len: Long, width: Int,
    height: Int, channels: Int)

/** Multimodal-column plumbing (north-star extensions): treat media as
  * opaque `binary` columns with typed metadata; run decode/feature-extract
  * as a partition-batched typed transform.
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * environment): [[StubCodec.decode]] derives deterministic fake dimensions
  * from the byte length. Everything around it — the binary schema, the
  * `Dataset[MediaRecord]` encoder, per-partition codec initialization, the
  * batch shape — is real and tested; swapping in a real decoder changes
  * only the stub body.
  *
  * Scale notes: decode is a narrow per-partition map (no shuffle); codec
  * init cost is amortized per partition, not per row — the pattern that
  * matters when partitions hold thousands of multi-MB payloads.
  */
object Multimodal {

  /** STUB decoder boundary. A real implementation would dispatch on
    * `format` to an image/audio codec; this derives deterministic fake
    * dimensions so the plumbing is testable end-to-end.
    */
  object StubCodec {
    /** Per-partition initialization hook (real codecs allocate native
      * contexts here). Returns a decode function for reuse across the
      * partition's rows.
      */
    def open(): MediaRecord => MediaFeatures = { rec =>
      val len = rec.payload.length.toLong
      MediaFeatures(
        doc_id = rec.doc_id,
        byte_len = len,
        width = (320 + (len % 16) * 8).toInt,
        height = (240 + (len % 9) * 8).toInt,
        channels = (1 + rec.doc_id % 3).toInt)
    }
  }

  /** Wrap a text table as media records: payload = utf-8 bytes (the
    * deterministic stand-in for real image/audio bytes), format from id.
    */
  def toMediaRecords(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      element_at(array(lit("jpeg"), lit("png"), lit("wav")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"))
      .as[MediaRecord]
  }

  /** Partition-batched decode: codec opened once per partition, applied
    * row-by-row — the standard Spark shape for expensive per-row native
    * work (mirrors what `mapInPandas` does for Python codecs).
    */
  def decodeFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      val decode = StubCodec.open()
      it.map(decode)
    }
  }

  /** Resize plumbing: recompute target dimensions preserving aspect ratio
    * (the geometry math is real; the pixel resampling would live in the
    * codec and is stubbed like decode). Pure column math — runs at scan
    * speed.
    */
  def resizeMeta(features: Dataset[MediaFeatures], maxDim: Int): DataFrame =
    features.toDF().withColumn("scale",
      least(lit(1.0), lit(maxDim) / greatest(col("width"), col("height"))))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))
      .drop("scale")

  /** 64-bit content hash over the raw payload bytes for media NEAR-DUP:
    * feeds [[graft.dedup.Dedup.simhashPairs]]'s banded hamming join, so
    * the whole media-dedup path — hash at scan speed, block-banded
    * equi-join, hamming verify — is the text SimHash machinery reused.
    * The hash here is SimHash over the payload's byte stream (exact for
    * the text-bytes stand-in payloads); a real image pipeline swaps in a
    * perceptual hash (pHash/aHash) AT THE CODEC BOUNDARY like decode, and
    * everything downstream is unchanged.
    */
  def contentHash64(records: Dataset[MediaRecord]): DataFrame =
    records.toDF().select(col("doc_id").as("_id"),
      graft.dedup.SimHashExpr.simhashCol(col("payload").cast("string"))
        .as("simhash"))

  /** Frame-sampling plumbing demo: every k-th byte of the payload as a
    * "frame" offset list — the partition/batch shape of video frame
    * sampling with the sampler stubbed.
    */
  def sampleFrameOffsets(records: Dataset[MediaRecord], stride: Int): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    records.map(r => (r.doc_id, (0L until r.payload.length.toLong by stride).toArray))
      .toDF("doc_id", "frame_offsets")
  }
}
