package graft.ext

import graft.SparkSpec

/** Byte-level image decoder: real parsing of PNG IHDR and the JPEG marker
  * walk, plus the corrupt-payload contract (None, never a throw).
  */
class MultimodalSpec extends SparkSpec {

  test("PNG dimensions decode from IHDR") {
    val b = Multimodal.synthImage(7L, width = 640, height = 480, png = true)
    Multimodal.decodeImage(7L, b) shouldBe
      Some(Multimodal.ImageMeta(7L, "png", 640, 480))
  }

  test("JPEG dimensions decode from SOF0 behind COM and DQT segments") {
    val b = Multimodal.synthImage(9L, width = 1023, height = 767, png = false)
    Multimodal.decodeImage(9L, b) shouldBe
      Some(Multimodal.ImageMeta(9L, "jpeg", 1023, 767))
  }

  test("JPEG walk handles fill bytes, length-less markers, and stops at SOS/EOI") {
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    val soi = Array[Byte](0xff.toByte, 0xd8.toByte)
    val sof = Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++
      Array[Byte](8) ++ be16(99) ++ be16(77) ++
      Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
    // fill bytes (extra 0xFF runs) and a length-less RST marker before SOF
    val padded = soi ++ Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0x01) ++
      Array[Byte](0xff.toByte, 0xd0.toByte) ++ sof
    Multimodal.decodeImage(1L, padded) shouldBe
      Some(Multimodal.ImageMeta(1L, "jpeg", 77, 99))
    // SOS before any SOF: dimensions unavailable, must be None (not a scan
    // into entropy-coded data)
    val sos = soi ++ Array[Byte](0xff.toByte, 0xda.toByte) ++ be16(4) ++
      Array[Byte](0, 0, 0x12, 0x34)
    Multimodal.decodeImage(2L, sos) shouldBe None
  }

  test("PNG-signature payload without an IHDR first chunk yields None") {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val notIhdr = sig ++ Array[Byte](0, 0, 0, 13) ++ "JUNK".getBytes("US-ASCII") ++
      new Array[Byte](13)
    Multimodal.decodeImage(3L, notIhdr) shouldBe None
  }

  test("corrupt payloads yield None, never a throw") {
    Multimodal.decodeImage(1L, Array.emptyByteArray) shouldBe None
    Multimodal.decodeImage(1L, "not an image".getBytes("UTF-8")) shouldBe None
    // JPEG SOI then garbage (broken marker stream)
    Multimodal.decodeImage(1L,
      Array[Byte](0xff.toByte, 0xd8.toByte, 0x12, 0x34, 0x56, 0x78, 0, 0, 0, 0, 0, 0)) shouldBe None
    // PNG signature but truncated before IHDR data
    Multimodal.decodeImage(1L,
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a, 0, 0)) shouldBe None
  }

  test("WAV decode: synthesized header round-trips through the chunk walk") {
    // synthWav plants an odd-sized LIST chunk before fmt — the walk must
    // skip its pad byte to land on the fmt tag
    val b = Multimodal.synthWav(7L, channels = 2, sampleRate = 16000, bits = 16, nFrames = 100)
    Multimodal.decodeWav(7L, b) shouldBe
      Some(Multimodal.AudioMeta(7L, 2, 16000, 16, 100L, 100L * 1000 / 16000))
    // mono 8-bit: blockAlign 1
    val m = Multimodal.synthWav(8L, channels = 1, sampleRate = 8000, bits = 8, nFrames = 8000)
    Multimodal.decodeWav(8L, m) shouldBe
      Some(Multimodal.AudioMeta(8L, 1, 8000, 8, 8000L, 1000L))
  }

  test("WAV decode: corrupt/truncated payloads yield None, never a throw") {
    Multimodal.decodeWav(1L, Array.emptyByteArray) shouldBe None
    Multimodal.decodeWav(1L, "RIFFxxxxNOPE".getBytes("US-ASCII")) shouldBe None
    // valid header, data chunk declared past the end of the payload
    val good = Multimodal.synthWav(1L, 2, 16000, 16, 10)
    Multimodal.decodeWav(1L, good.take(good.length - 5)) shouldBe None
    // fmt chunk shorter than the spec's 16 bytes
    val shortFmt = "RIFF".getBytes("US-ASCII") ++ Array[Byte](20, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ new Array[Byte](4)
    Multimodal.decodeWav(1L, shortFmt) shouldBe None
  }

  test("imageMeta runs partition-wise over a Dataset") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, Multimodal.synthImage(1L, 10, 20, png = true), "image", "png"),
      Multimodal.MediaRow(2L, Multimodal.synthImage(2L, 30, 40, png = false), "image", "jpeg"),
      Multimodal.MediaRow(3L, "junk".getBytes("UTF-8"), "image", "png")))
    val out = Multimodal.imageMeta(media).collect().sortBy(_.id)
    out shouldBe Seq(
      Multimodal.ImageMeta(1L, "png", 10, 20),
      Multimodal.ImageMeta(2L, "jpeg", 30, 40))
  }
}
