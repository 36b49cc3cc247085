package graft.api

import graft.SparkSpec
import graft.registry._

/** uploadMediaZip's two routing modes (reference: services/csv-import.js
  * :961-1021): structured folders win when present; otherwise files
  * distribute to media fields by filename keyword — and one file may
  * serve several fields.
  */
class EngineMediaSpec extends SparkSpec {

  private val ct = ContentType("api::rec.rec", "Rec", Seq(
    Attribute("code", AttrKind.StringK),
    Attribute("image", AttrKind.MediaK),
    Attribute("document", AttrKind.MediaK),
    Attribute("audio", AttrKind.MediaK)))
  private val registry = ContentTypeRegistry(Seq(ct))
  private def engine = new Engine(spark, registry, _ => fail("no tables"))

  private def buildZip(dir: String, entries: Seq[String]): String = {
    val d = new java.io.File(dir)
    if (d.exists()) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(d.toPath).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    d.mkdirs()
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$dir/a.zip"))
    entries.foreach { e =>
      zos.putNextEntry(new java.util.zip.ZipEntry(e))
      zos.write(e.getBytes("UTF-8")); zos.closeEntry()
    }
    zos.close()
    dir
  }

  test("keyword mode: no structured folders, files route by filename keyword") {
    val dir = buildZip("/tmp/graft_media_spec_kw", Seq(
      "data/report_1.pdf",     // 'report' → document
      "data/photo_2.png",      // 'photo' → image
      "data/music_3.mp3",      // 'music' → audio
      "data/image_doc_4.pdf",  // 'image' AND 'doc' → BOTH fields
      "data/misc_5.bin",       // no keyword → unmapped
      "stray.txt",             // root level — ignored
      "__MACOSX/._junk"))      // system — ignored
    val out = engine.uploadMediaZip(dir, "api::rec.rec")
      .collect().map(r => (r.getAs[String]("field"), r.getAs[String]("name"))).toSet
    out shouldBe Set(
      ("document", "report_1.pdf"),
      ("image", "photo_2.png"),
      ("audio", "music_3.mp3"),
      ("image", "image_doc_4.pdf"),
      ("document", "image_doc_4.pdf"))
  }

  test("structured mode: field folders win; unbucketed and keyword files drop") {
    val dir = buildZip("/tmp/graft_media_spec_st", Seq(
      "image/x.pdf",          // folder beats extension/keywords
      "document/report.png",
      "notes/photo_1.png"))   // keyword file IGNORED because structure exists
    val out = engine.uploadMediaZip(dir, "api::rec.rec")
      .collect().map(r => (r.getAs[String]("field"), r.getAs[String]("name"))).toSet
    out shouldBe Set(("image", "x.pdf"), ("document", "report.png"))
  }

  test("mime fallback survives unknown and missing extensions (ANSI)") {
    val dir = buildZip("/tmp/graft_media_spec_mime", Seq(
      "image/readme",          // no extension
      "image/pic.heic"))       // unknown extension
    val out = engine.uploadMediaZip(dir, "api::rec.rec")
      .collect().map(r => r.getAs[String]("mime")).toSet
    out shouldBe Set("application/octet-stream")
  }
}
