package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary
  * payloads with typed metadata, processed by batched partition-local
  * feature extraction.
  *
  * The decode step is a clearly-marked STUB — this container has no
  * image/audio codecs, so "decode" is a deterministic fake; a real
  * deployment swaps `stubDecode` for a codec call. Everything Spark-
  * side (schema, encoders, partition batching, feature layout) is real
  * and tested.
  *
  * Scale posture: payloads never pass through a shuffle (extraction is
  * a narrow mapPartitions directly over the scan); feature vectors are
  * small fixed-width arrays; metadata lives in plain columns so
  * filters (modality, size) push down to parquet without touching the
  * binary blob.
  */
object Multimodal {

  case class MediaRecord(
      media_id: Long,
      modality: String,
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int)

  case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Int,
      checksum: Long,
      features: Array[Float])

  implicit val mediaRecordEnc: Encoder[MediaRecord] = Encoders.product[MediaRecord]
  implicit val mediaFeaturesEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** Build a media table from the documents corpus (payload = utf-8
    * bytes standing in for an encoded image/audio blob). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("modality"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("doc_id") % 640 + 32).cast("int").as("width"),
        (col("doc_id") % 480 + 32).cast("int").as("height"),
        lit(16000).as("sample_rate"))
      .as[MediaRecord]
  }

  // ---------------------------------------------------------------
  // STUB DECODE: deterministic fake standing in for a codec call.
  // Replace with e.g. javax.imageio / ffmpeg bindings in deployment.
  // ---------------------------------------------------------------
  private def stubDecode(payload: Array[Byte], dim: Int): (Long, Array[Float]) = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = h * 31 + payload(i); i += 1 }
    val feats = Array.tabulate(dim)(j => ((h >>> (j * 7)) & 0xFF).toFloat / 255f)
    (h, feats)
  }

  /** Batched partition-local feature extraction over the binary
    * payloads — the mapInPandas-style batch shape, as a narrow op. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 8): Dataset[MediaFeatures] =
    media.mapPartitions { it =>
      it.map { r =>
        val (checksum, feats) = stubDecode(r.payload, dim)
        MediaFeatures(r.media_id, r.modality, r.payload.length, checksum, feats)
      }
    }

  /** Frame sampling stub for video payloads: pretends each `frameBytes`
    * slice is a frame, keeps every `stride`-th — demonstrates the
    * explode-to-frames plumbing without a codec. */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int = 64, stride: Int = 4): DataFrame =
    media.toDF()
      .withColumn("n_frames", floor(length(col("payload")) / frameBytes).cast("int"))
      .filter(col("n_frames") > 0)
      .withColumn("frame_idx", explode(expr(s"sequence(0, n_frames - 1, $stride)")))
      .select(col("media_id"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)").as("frame_payload"))
}
