package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise with `mapPartitions`.
  *
  * The perceptual-feature step is a clearly-marked DETERMINISTIC STUB (no
  * image/audio codecs in this environment), but `decodeImage` is a REAL
  * byte-level decoder (PNG IHDR / JPEG SOF dimensions). Everything around
  * them — schema, typed encoders, partition-wise batching, feature schema —
  * is real and is the part that matters on a cluster: the decode closure
  * runs once per partition with zero driver involvement, so swapping in a
  * full codec is a one-function change.
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

  // ------------------------------------------------------ image metadata
  /** Decoded image header metadata — a REAL byte-level decode (not the
    * feature stub above): PNG dimensions from the IHDR chunk, JPEG from the
    * SOF marker found by walking the segment stream.
    */
  final case class ImageMeta(id: Long, format: String, width: Int, height: Int)

  /** Parse image dimensions from raw bytes.
    *
    *   - PNG: 8-byte signature `89 50 4E 47 0D 0A 1A 0A`, then the IHDR
    *     chunk is mandatory-first — its tag is VERIFIED at offset 12
    *     before the width/height words at offsets 16/20 are trusted.
    *   - JPEG: `FF D8` SOI, then a marker walk that handles the
    *     spec-legal stream structure: 0xFF fill/padding bytes before a
    *     marker are skipped, length-less markers (TEM 0x01, RST0-7
    *     D0-D7, SOI D8) are stepped over, EOI/SOS stop the scan, and the
    *     first start-of-frame marker (C0-CF except C4 DHT / C8 JPG / CC
    *     DAC) yields precision(1) height(2) width(2).
    *
    * Returns None for anything unparseable — a corrupt payload must never
    * kill a 100 TB scan.
    */
  def decodeImage(id: Long, b: Array[Byte]): Option[ImageMeta] = {
    def u(i: Int): Int = b(i) & 0xff
    def be32(i: Int): Int = (u(i) << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)
    def be16(i: Int): Int = (u(i) << 8) | u(i + 1)
    if (b.length >= 24 && u(0) == 0x89 && u(1) == 'P' && u(2) == 'N' && u(3) == 'G') {
      val ihdr = u(12) == 'I' && u(13) == 'H' && u(14) == 'D' && u(15) == 'R'
      if (ihdr) Some(ImageMeta(id, "png", be32(16), be32(20))) else None
    } else if (b.length >= 4 && u(0) == 0xff && u(1) == 0xd8) {
      var i = 2
      while (i + 1 < b.length) {
        if (u(i) != 0xff) return None
        // fill bytes: any run of 0xFF before the marker byte is padding
        while (i + 1 < b.length && u(i + 1) == 0xff) i += 1
        if (i + 1 >= b.length) return None
        val marker = u(i + 1)
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (i + 8 >= b.length) return None
          return Some(ImageMeta(id, "jpeg", be16(i + 7), be16(i + 5)))
        }
        if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS: no SOF seen
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8))
          i += 2 // length-less marker
        else {
          if (i + 3 >= b.length) return None
          val len = be16(i + 2)
          if (len < 2) return None
          i += 2 + len
        }
      }
      None
    } else None
  }

  /** Partition-wise dimension extraction; undecodable payloads drop. */
  def imageMeta(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(m => decodeImage(m.id, m.bytes)))
  }

  // ------------------------------------------------------ audio metadata
  /** Decoded WAV header metadata — a REAL byte-level decode like
    * `decodeImage`: RIFF/WAVE chunk walk to the `fmt ` chunk (channels,
    * sample rate, bits per sample, block align) and the `data` chunk
    * (payload size → frame count → duration).
    */
  final case class AudioMeta(id: Long, channels: Int, sample_rate: Int,
      bits_per_sample: Int, n_frames: Long, duration_ms: Long)

  /** Parse WAV metadata from raw bytes (RIFF spec):
    *
    *   - `RIFF` tag at 0, `WAVE` form type at 8; chunks follow from 12 as
    *     tag(4) + LE32 size + payload, padded to word (even) boundaries —
    *     the walk must skip the pad byte after odd-sized chunks (LIST/INFO
    *     metadata chunks routinely precede `fmt `).
    *   - `fmt `: channels LE16@+2, sample rate LE32@+4, block align
    *     LE16@+12, bits per sample LE16@+14 (all offsets within the chunk
    *     payload).
    *   - `data`: payload size alone is needed — frames = size / blockAlign.
    *
    * Returns None for anything unparseable or truncated — a corrupt
    * payload must never kill a 100 TB scan.
    */
  def decodeWav(id: Long, b: Array[Byte]): Option[AudioMeta] = {
    def u(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u(i) | (u(i + 1) << 8)
    def le32(i: Int): Long =
      (u(i) | (u(i + 1) << 8) | (u(i + 2) << 16)).toLong | (u(i + 3).toLong << 24)
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    if (b.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var channels = -1; var rate = -1L; var block = -1; var bits = -1
    var dataSize = -1L
    while (i + 8 <= b.length) {
      val t = tag(i)
      val size = le32(i + 4)
      if (size < 0 || i + 8 + size > b.length) return None // truncated chunk
      if (t == "fmt ") {
        if (size < 16) return None
        channels = le16(i + 10)
        rate = le32(i + 12)
        block = le16(i + 20)
        bits = le16(i + 22)
      } else if (t == "data") dataSize = size
      i += 8 + size.toInt + (size.toInt & 1) // word-aligned chunks
    }
    if (channels <= 0 || rate <= 0 || rate > Int.MaxValue || block <= 0 || dataSize < 0) None
    else {
      val frames = dataSize / block
      Some(AudioMeta(id, channels, rate.toInt, bits, frames, frames * 1000L / rate))
    }
  }

  /** Partition-wise audio-metadata extraction; undecodable payloads drop. */
  def audioMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(m => decodeWav(m.id, m.bytes)))
  }

  /** Deterministic synthetic WAV payload: RIFF/WAVE with an odd-sized LIST
    * chunk BEFORE `fmt ` (exercises the pad-byte walk), a spec-shaped
    * `fmt ` chunk, and a zeroed `data` chunk of `nFrames` frames.
    */
  def synthWav(id: Long, channels: Int, sampleRate: Int, bits: Int, nFrames: Long): Array[Byte] = {
    def le32(v: Long) = Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    val block = channels * bits / 8
    val dataSize = (nFrames * block).toInt
    // odd payload length forces the decoder to honor word alignment
    val infoRaw = s"INFOsynthetic $id".getBytes("US-ASCII")
    val info = if (infoRaw.length % 2 == 1) infoRaw else infoRaw :+ 'x'.toByte
    val list = "LIST".getBytes("US-ASCII") ++ le32(info.length.toLong) ++ info ++ Array[Byte](0)
    val fmt = "fmt ".getBytes("US-ASCII") ++ le32(16L) ++
      le16(1) ++ le16(channels) ++ le32(sampleRate.toLong) ++
      le32(sampleRate.toLong * block) ++ le16(block) ++ le16(bits)
    val data = "data".getBytes("US-ASCII") ++ le32(dataSize.toLong) ++
      new Array[Byte](dataSize + (dataSize & 1))
    val body = list ++ fmt ++ data
    "RIFF".getBytes("US-ASCII") ++ le32(4L + body.length) ++ "WAVE".getBytes("US-ASCII") ++ body
  }

  /** Deterministic synthetic image payload (valid PNG signature + IHDR, or
    * a JPEG marker stream with COM + DQT segments before SOF0) — exercises
    * the decoder's real parsing paths without codecs in the container.
    */
  def synthImage(id: Long, width: Int, height: Int, png: Boolean): Array[Byte] = {
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    if (png)
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        be32(13) ++ "IHDR".getBytes("US-ASCII") ++
        be32(width) ++ be32(height) ++
        Array[Byte](8, 6, 0, 0, 0) ++ be32(0) // bit depth/color/CRC filler
    else {
      val com = s"synthetic $id".getBytes("UTF-8")
      Array[Byte](0xff.toByte, 0xd8.toByte) ++                      // SOI
        Array[Byte](0xff.toByte, 0xfe.toByte) ++ be16(com.length + 2) ++ com ++ // COM
        Array[Byte](0xff.toByte, 0xdb.toByte) ++ be16(4) ++ Array[Byte](0, 1) ++ // DQT-ish
        Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++        // SOF0
        Array[Byte](8) ++ be16(height) ++ be16(width) ++
        Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1) ++
        Array[Byte](0xff.toByte, 0xd9.toByte)                       // EOI
    }
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
