package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise with `mapPartitions`.
  *
  * The decode step is a clearly-marked DETERMINISTIC STUB (no image/audio
  * codecs in this environment); everything around it — schema, typed
  * encoders, partition-wise batching, feature schema — is real and is the
  * part that matters on a cluster: the decode closure runs once per
  * partition with zero driver involvement, so swapping in a real codec is a
  * one-function change.
  */
object Multimodal {

  /** One media payload: id + raw bytes + declared modality/format. */
  final case class MediaRow(id: Long, bytes: Array[Byte], modality: String, format: String)

  /** Extracted features (what a real decoder would produce). */
  final case class MediaFeatures(
      id: Long,
      modality: String,
      byte_len: Long,
      /** STUB: stands in for decoded width/sample-rate/frame-count */
      channels: Int,
      /** STUB: content checksum standing in for a perceptual hash */
      content_hash: Long,
  )

  /** STUB DECODER — deterministic fake. A real implementation would decode
    * the payload with a codec; this derives features only from byte length
    * and a checksum so results are stable and oracle-checkable.
    */
  private def decodeStub(m: MediaRow): MediaFeatures = {
    var h = 1125899906842597L // deterministic FNV-ish fold, wraps silently in JVM
    var i = 0
    val step = math.max(1, m.bytes.length / 64) // sample at most 64 bytes
    while (i < m.bytes.length) { h = h * 31 + m.bytes(i); i += step }
    MediaFeatures(m.id, m.modality, m.bytes.length.toLong,
      channels = (math.floorMod(m.bytes.length, 4)) + 1, content_hash = h)
  }

  /** Partition-wise feature extraction: the Spark-side shape (typed Dataset
    * in, typed Dataset out, one decoder call per row, batched per
    * partition) is exactly what a real codec UDF needs.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Frame-sampling plumbing for video-like payloads: emit `n` byte-range
    * "frames" per payload (a real implementation would seek keyframes).
    */
  def sampleFrames(media: Dataset[MediaRow], n: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val len = m.bytes.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { i =>
        val start = (len.toLong * i / n).toInt
        val end = (len.toLong * (i + 1) / n).toInt
        (m.id, i, end - start)
      }
    }.toDF("id", "frame_idx", "frame_bytes")
  }

  /** Wrap a text table as a binary media table (test/demo source: the bytes
    * ARE the UTF-8 text; a real pipeline reads `binaryFile`).
    */
  def fromText(df: DataFrame, idCol: String, textCol: String, modality: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"), encode(col(textCol), "UTF-8").as("bytes"),
      lit(modality).as("modality"), lit("txt").as("format")).as[MediaRow]
  }
}
