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
  * The codec boundary ([[Codec]]) dispatches on the format tag: png/jpeg
  * payloads get a REAL pixel decode via `javax.imageio` (JDK built-in, no
  * new dependency); audio (`wav`) and opaque (`bin`) payloads fall to a
  * deterministic stub (no audio codec in this environment). The plumbing
  * — binary schema, `Dataset[MediaRecord]` encoder, per-partition codec
  * initialization, batch shape — is identical either way.
  *
  * Scale notes: decode is a narrow per-partition map (no shuffle); codec
  * init cost is amortized per partition, not per row — the pattern that
  * matters when partitions hold thousands of multi-MB payloads.
  */
object Multimodal {

  /** Decoder boundary. png/jpeg → real `ImageIO` pixel decode; anything
    * else (wav, bin) → deterministic stub features derived from the byte
    * length, so non-image plumbing stays testable end-to-end without an
    * audio codec.
    */
  object Codec {
    /** Per-partition initialization hook (real codecs allocate native
      * contexts here; `ImageIO` needs none). Returns a decode function
      * for reuse across the partition's rows.
      */
    def open(): MediaRecord => MediaFeatures = { rec =>
      rec.format match {
        case "png" | "jpeg" =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(rec.payload))
          if (img == null)
            throw new IllegalArgumentException(
              s"doc ${rec.doc_id}: payload is not a decodable ${rec.format}")
          MediaFeatures(
            doc_id = rec.doc_id,
            byte_len = rec.payload.length.toLong,
            width = img.getWidth,
            height = img.getHeight,
            channels = img.getColorModel.getNumComponents)
        case _ =>
          val len = rec.payload.length.toLong
          MediaFeatures(
            doc_id = rec.doc_id,
            byte_len = len,
            width = (320 + (len % 16) * 8).toInt,
            height = (240 + (len % 9) * 8).toInt,
            channels = (1 + rec.doc_id % 3).toInt)
      }
    }
  }

  /** Wrap a text table as media records: payload = utf-8 bytes (the
    * deterministic stand-in for real media bytes), honestly tagged `bin`
    * so the codec takes the stub path — for real image payloads see
    * [[syntheticImages]].
    */
  def toMediaRecords(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("bin").as("format"))
      .as[MediaRecord]
  }

  /** Planted image dimensions for [[syntheticImages]]: pure doc_id
    * arithmetic, so an external oracle can replay width/height without
    * decoding anything.
    */
  def plantedWidth(docId: Long): Int = (8 + docId % 16).toInt
  def plantedHeight(docId: Long): Int = (8 + docId % 9).toInt

  /** Media records with REAL image payloads: each png/jpeg row carries an
    * actual encoded image of planted (doc_id-arithmetic) dimensions with
    * deterministic pixel content, built distributed (narrow map, no
    * shuffle) with `BufferedImage` + `ImageIO` — test-data synthesis for
    * the real decode path. Every third row stays a `wav`-tagged text
    * payload so one query exercises both codec branches. JPEG is lossy
    * but dimensions survive exactly — which is what the decode contract
    * asserts.
    */
  def syntheticImages(documents: DataFrame): Dataset[MediaRecord] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (docId, text) =>
        val format = (docId % 3) match {
          case 0 => "jpeg"
          case 1 => "png"
          case _ => "wav"
        }
        if (format == "wav") MediaRecord(docId, text.getBytes("UTF-8"), format)
        else {
          val w = plantedWidth(docId)
          val h = plantedHeight(docId)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              // deterministic pixels; value is irrelevant to the decode
              // contract (dimensions), but keeps the bytes reproducible
              img.setRGB(x, y, ((docId * 31 + x * 7 + y) & 0xffffff).toInt)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, format, bos)
          MediaRecord(docId, bos.toByteArray, format)
        }
    }
  }

  /** Partition-batched decode: codec opened once per partition, applied
    * row-by-row — the standard Spark shape for expensive per-row native
    * work (mirrors what `mapInPandas` does for Python codecs).
    */
  def decodeFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      val decode = Codec.open()
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
