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
