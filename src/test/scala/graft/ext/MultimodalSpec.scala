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

  private def cellFn(base: Long)(bx: Int, by: Int): Int =
    ((base * 37 + bx * 17 + by * 29) % 251).toInt

  test("PNG pixel decode round-trips synthPng for every color type and filter") {
    // h >= 5 rows ⇒ all five filter types appear (row y uses filter y%5)
    for ((ct, id) <- Seq((0, 3L), (2, 4L), (6, 5L))) {
      val w = 24; val h = 16
      val b = Multimodal.synthPng(id, w, h, ct, cellFn(id))
      val img = Multimodal.decodePngPixels(id, b).getOrElse(fail(s"ct=$ct did not decode"))
      img.width shouldBe w
      img.height shouldBe h
      img.channels shouldBe (if (ct == 0) 1 else if (ct == 2) 3 else 4)
      for (y <- 0 until h; x <- 0 until w)
        withClue(s"ct=$ct ($x,$y): ") {
          img.gray(y * w + x) shouldBe cellFn(id)(x * 8 / w, y * 8 / h)
        }
    }
  }

  test("PNG pixel decode agrees with the JDK's own ImageIO decoder") {
    for ((ct, id) <- Seq((0, 11L), (2, 12L), (6, 13L))) {
      val w = 32; val h = 24
      val b = Multimodal.synthPng(id, w, h, ct, cellFn(id))
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      ref should not be null
      ref.getWidth shouldBe w
      ref.getHeight shouldBe h
      val img = Multimodal.decodePngPixels(id, b).get
      for (y <- 0 until h; x <- 0 until w) {
        // raw raster sample (getRGB would gamma-convert grayscale to
        // sRGB); synth pixels have R=G=B, so channel 0 IS the luma
        val expected = ref.getRaster.getSample(x, y, 0)
        withClue(s"ct=$ct ($x,$y): ") { img.gray(y * w + x) shouldBe expected }
      }
    }
  }

  test("GIF frame decode round-trips synthGif: count, geometry, delays, pixel means") {
    val id = 42L
    val w = 10; val h = 7; val nf = 3
    def pix(f: Int, x: Int, y: Int): Int = (f * 13 + x * 7 + y * 3) % 256
    val b = Multimodal.synthGif(id, w, h, nf, pix, f => 10 * f + 5, f => (f % 2, f % 3))
    val frames = Multimodal.decodeGifFrames(id, b)
    frames.map(_.frame_idx) shouldBe Seq(0, 1, 2)
    frames.foreach { fr =>
      fr.width shouldBe w
      fr.height shouldBe h
      fr.left_px shouldBe fr.frame_idx % 2
      fr.top_px shouldBe fr.frame_idx % 3
      fr.delay_cs shouldBe 10 * fr.frame_idx + 5
      val expect = (for (y <- 0 until h; x <- 0 until w) yield pix(fr.frame_idx, x, y).toLong)
        .sum / (w * h)
      fr.mean_luma shouldBe expect.toInt
    }
  }

  test("GIF LZW stream decodes identically under the JDK's own ImageIO reader") {
    val id = 43L
    val w = 40; val h = 20 // > 128 px per frame: exercises the re-CLEAR cadence
    def pix(f: Int, x: Int, y: Int): Int = (f * 31 + x * 5 + y * 11) % 256
    val b = Multimodal.synthGif(id, w, h, 2, pix, _ => 4)
    val in = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(b))
    val reader = javax.imageio.ImageIO.getImageReaders(in).next()
    reader.setInput(in)
    reader.getNumImages(true) shouldBe 2
    for (f <- 0 until 2) {
      val img = reader.read(f)
      img.getWidth shouldBe w
      img.getHeight shouldBe h
      for (y <- 0 until h; x <- 0 until w) {
        // grayscale palette: index == each RGB channel value
        (img.getRGB(x, y) & 0xff) shouldBe pix(f, x, y)
      }
    }
    reader.dispose()
  }

  test("GIF frame decode: corrupt payloads yield Nil, never a throw") {
    val good = Multimodal.synthGif(1L, 9, 9, 2, (f, x, y) => f + x + y, _ => 1)
    Multimodal.decodeGifFrames(1L, good) should have size 2
    // truncation anywhere: header, palette, INSIDE an image-data
    // sub-block (the copy path throws the PLAIN IndexOutOfBounds, not
    // the Array subclass), missing trailer
    for (cut <- Seq(3, 10, 400, 13 + 768 + 8 + 10 + 5, good.length - 1)) {
      Multimodal.decodeGifFrames(1L, good.take(cut)) shouldBe Nil
    }
    // wrong signature / non-GIF bytes / empty
    Multimodal.decodeGifFrames(1L, "GIF00a garbage".getBytes("US-ASCII")) shouldBe Nil
    Multimodal.decodeGifFrames(1L, "not a gif at all".getBytes("US-ASCII")) shouldBe Nil
    Multimodal.decodeGifFrames(1L, Array.emptyByteArray) shouldBe Nil
    // hostile dimensions: 65535x65535 frame must refuse before allocating
    val huge = good.clone()
    // image descriptor of frame 0 starts after header(13) + GCT(768) + GCE(8)
    val desc = 13 + 768 + 8
    huge(desc + 5) = 0xff.toByte; huge(desc + 6) = 0xff.toByte
    huge(desc + 7) = 0xff.toByte; huge(desc + 8) = 0xff.toByte
    Multimodal.decodeGifFrames(1L, huge) shouldBe Nil
  }

  test("AVI frame walk round-trips synthAvi: geometry, timing, sizes, keyframes") {
    val id = 77L
    val sizes = Array(33, 200, 7, 120) // odd sizes exercise the pad walk
    val b = Multimodal.synthAvi(id, 320, 240, 40000L, sizes(_), 4, _ % 3 == 0)
    val frames = Multimodal.decodeAviFrames(id, b)
    frames.map(_.frame_idx) shouldBe Seq(0, 1, 2, 3)
    frames.foreach { fr =>
      fr.width shouldBe 320
      fr.height shouldBe 240
      fr.us_per_frame shouldBe 40000L
      fr.size shouldBe sizes(fr.frame_idx)
      fr.keyframe shouldBe (fr.frame_idx % 3 == 0)
    }
  }

  test("AVI frame walk: interleaved audio chunks don't break the idx1 join") {
    // the normal real-world layout: ##dc video + ##wb audio, BOTH in idx1
    val sizes = Array(15, 40)
    val b = Multimodal.synthAvi(5L, 100, 80, 50000L, sizes(_), 2,
      _ == 0, interleaveAudio = true)
    val frames = Multimodal.decodeAviFrames(5L, b)
    frames should have size 2 // audio chunks are neither frames nor index rows
    frames.map(_.size).toSeq shouldBe sizes.toSeq
    frames.map(_.keyframe).toSeq shouldBe Seq(true, false)
  }

  test("AVI frame walk: corrupt payloads yield Nil, never a throw") {
    val good = Multimodal.synthAvi(1L, 64, 48, 33333L, f => f + 5, 3)
    Multimodal.decodeAviFrames(1L, good) should have size 3
    for (cut <- Seq(5, 20, 100, good.length - 1)) {
      Multimodal.decodeAviFrames(1L, good.take(cut)) shouldBe Nil
    }
    Multimodal.decodeAviFrames(1L, "RIFFxxxxWAVE".getBytes("US-ASCII")) shouldBe Nil
    Multimodal.decodeAviFrames(1L, Array.emptyByteArray) shouldBe Nil
    // header/movi frame-count disagreement is corrupt, not a best guess:
    // patch avih's dwTotalFrames (RIFF 12 + LIST hdr 12 + chunk hdr 8 + 16)
    val lied = good.clone()
    lied(12 + 12 + 8 + 16) = 9
    Multimodal.decodeAviFrames(1L, lied) shouldBe Nil
  }

  test("averageHash: hand-computed bits on an 8x8 one-pixel-per-cell image") {
    // gray values 0..63: mean of cell means = (0+..+63)/64 = 31 (floor);
    // bit k set iff k > 31 ⇒ top half of the image dark, bottom half set
    val gray = Array.tabulate(64)(identity)
    val hash = Multimodal.averageHash(8, 8, gray)
    Multimodal.hashBits(hash) shouldBe ("0" * 32 + "1" * 32)
    hash shouldBe 0x00000000ffffffffL
  }

  test("PNG pixel decode: corrupt payloads yield None, never a throw") {
    val good = Multimodal.synthPng(1L, 16, 16, 2, cellFn(1L))
    Multimodal.decodePngPixels(1L, good).isDefined shouldBe true
    // flip one byte inside the first IDAT payload: CRC check must reject
    val bitflip = good.clone()
    bitflip(8 + 25 + 12) = (bitflip(8 + 25 + 12) ^ 0x01).toByte
    Multimodal.decodePngPixels(1L, bitflip) shouldBe None
    // truncation mid-chunk
    Multimodal.decodePngPixels(1L, good.take(good.length / 2)) shouldBe None
    // unsupported: 16-bit depth (patch IHDR byte + fix its CRC)
    val deep = good.clone()
    deep(8 + 8 + 8) = 16.toByte
    val crc = new java.util.zip.CRC32
    crc.update(deep, 8 + 4, 4 + 13)
    val cv = crc.getValue.toInt
    deep(8 + 8 + 13) = (cv >>> 24).toByte; deep(8 + 8 + 14) = (cv >>> 16).toByte
    deep(8 + 8 + 15) = (cv >>> 8).toByte; deep(8 + 8 + 16) = cv.toByte
    Multimodal.decodePngPixels(1L, deep) shouldBe None
    Multimodal.decodePngPixels(1L, "not a png".getBytes("UTF-8")) shouldBe None
    Multimodal.decodePngPixels(1L, Array.emptyByteArray) shouldBe None
  }

  private def pngChunk(tag: String, payload: Array[Byte]): Array[Byte] = {
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val body = tag.getBytes("US-ASCII") ++ payload
    val crc = new java.util.zip.CRC32
    crc.update(body)
    be32(payload.length) ++ body ++ be32(crc.getValue.toInt)
  }

  test("hostile PNGs degrade to None: huge chunk length, huge declared dims") {
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    // chunk length near Int.MaxValue: the bound check must not overflow
    // into accepting it and then crash the CRC read
    val hugeLen = sig ++ Array[Byte](0x7f, -1, -1, 0x74) ++
      "IHDR".getBytes("US-ASCII") ++ new Array[Byte](32)
    Multimodal.decodePngPixels(1L, hugeLen) shouldBe None
    // structurally valid PNG (real CRCs) declaring 2^30 x 4 pixels: the
    // raw-size cap must refuse BEFORE allocating, not throw
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val bigDims = sig ++
      pngChunk("IHDR", be32(0x40000000) ++ be32(4) ++ Array[Byte](8, 2, 0, 0, 0)) ++
      pngChunk("IDAT", Array[Byte](1, 2, 3)) ++
      pngChunk("IEND", Array.emptyByteArray)
    Multimodal.decodePngPixels(1L, bigDims) shouldBe None
    // zlib stream with the FDICT preset-dictionary bit: inflate() returns
    // 0 with needsDictionary() (not needsInput()) — the inflate loop must
    // bail out, not spin forever (CMF=0x78, FLG=0x20 keeps the %31 check:
    // (0x7820 % 31) == 0, FDICT bit set; 4 dict-id bytes follow)
    val fdict = sig ++
      pngChunk("IHDR", be32(4) ++ be32(4) ++ Array[Byte](8, 2, 0, 0, 0)) ++
      pngChunk("IDAT", Array[Byte](0x78, 0x20, 0, 0, 0, 1)) ++
      pngChunk("IEND", Array.emptyByteArray)
    Multimodal.decodePngPixels(1L, fdict) shouldBe None
  }

  test("valid PNG smaller than the 8x8 hash grid falls back, never throws") {
    val tiny = Multimodal.synthPng(1L, 4, 4, 2, (_, _) => 100) // real 4x4 PNG
    Multimodal.decodePngPixels(1L, tiny).isDefined shouldBe true
    import spark.implicits._
    val media = spark.createDataset(Seq(Multimodal.MediaRow(1L, tiny, "image", "png")))
    // too small to hash: dropped from the phash surface...
    Multimodal.imagePhash(media).collect() shouldBe empty
    // ...but features keep the decoded channel count with the CRC fallback
    val f = Multimodal.extractFeatures(media).collect().head
    f.channels shouldBe 3
    val crc = new java.util.zip.CRC32; crc.update(tiny)
    f.content_hash shouldBe crc.getValue
  }

  test("imagePhash + extractFeatures dispatch run partition-wise") {
    import spark.implicits._
    val png = Multimodal.synthPng(1L, 16, 16, 2, cellFn(1L))
    val wav = Multimodal.synthWav(2L, channels = 2, sampleRate = 8000, bits = 16, nFrames = 10)
    val txt = "plain text".getBytes("UTF-8")
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, png, "image", "png"),
      Multimodal.MediaRow(2L, wav, "audio", "wav"),
      Multimodal.MediaRow(3L, txt, "text", "txt")))
    val ph = Multimodal.imagePhash(media).collect()
    ph.map(_.id).toSeq shouldBe Seq(1L) // only the PNG decodes to pixels
    ph.head.phash_bits shouldBe Multimodal.hashBits(ph.head.phash)
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.id)
    feats.map(_.channels).toSeq shouldBe Seq(3, 2, 1) // png RGB, wav stereo, text
    feats(0).content_hash shouldBe ph.head.phash // image branch: perceptual
    val c = new java.util.zip.CRC32; c.update(txt)
    feats(2).content_hash shouldBe c.getValue // fallback branch: byte CRC
  }

  test("near-identical images land within hamming 3 of each other") {
    val base = Multimodal.decodePngPixels(1L,
      Multimodal.synthPng(1L, 32, 32, 2, cellFn(9L))).get
    val pert = Multimodal.decodePngPixels(2L,
      Multimodal.synthPng(2L, 32, 32, 2, (bx, by) =>
        if (bx == 0 && by == 0) (cellFn(9L)(0, 0) + 7) % 251 else cellFn(9L)(bx, by))).get
    val ha = Multimodal.averageHash(32, 32, base.gray)
    val hb = Multimodal.averageHash(32, 32, pert.gray)
    java.lang.Long.bitCount(ha ^ hb) should be <= 3
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
