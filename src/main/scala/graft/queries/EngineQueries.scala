package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.api.Engine
import graft.registry._

/** End-to-end endpoint queries driven through the Engine façade (EP1/EP3),
  * so the full pipeline composition — not just individual operators — sits
  * under the DuckDB oracle gate.
  */
object EngineQueries {

  private def q(name: String, oracle: String)(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame) =
    QueryDef(name, fn, Some(oracle))

  private val nationCt = ContentType("api::nation.nation", "Nation", Seq(
    Attribute("n_name", AttrKind.StringK, required = true, unique = true)))
  private val supplierCt = ContentType("api::supplier.supplier", "Supplier", Seq(
    Attribute("sname", AttrKind.StringK, required = true),
    Attribute("nation", AttrKind.RelationK, target = Some("api::nation.nation"),
      relationKind = Some("manyToOne")),
    Attribute("acctbal", AttrKind.DecimalK),
    Attribute("active", AttrKind.BooleanK, default = Some("true"))))
  private val registry = ContentTypeRegistry(Seq(nationCt, supplierCt))

  /** EP1: CSV-shaped strings → validate → resolve `nation.name` → merge. */
  val ep1Import = q("ep1_engine_import",
    """SELECT s_name AS sname, CAST(s_nationkey AS BIGINT) AS nation,
      |       round(s_acctbal, 2) AS acctbal,
      |       (s_suppkey % 2 = 0) AS active
      |FROM supplier""".stripMargin) { (s, dir) =>
    val nation = Tables.nation(s, dir)
    val csv = Tables.supplier(s, dir)
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name").as("sname"),
        col("n_name").as("nation.n_name"),
        col("s_acctbal").cast("string").as("acctbal"),
        when(col("s_suppkey") % 2 === 0, "yes").otherwise("0").as("active"))
    val target = s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("sname", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("nation", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("acctbal", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("active", org.apache.spark.sql.types.BooleanType))))
    val engine = new Engine(s, registry, {
      case "api::nation.nation" => (nation, "n_nationkey")
      case "api::supplier.supplier" => (target, "sname")
    })
    engine.importCsv(csv, "api::supplier.supplier", upsert = true, upsertField = "sname")
      .merged
      .select(col("sname"), col("nation"), round(col("acctbal"), 2).as("acctbal"), col("active"))
  }

  /** EP3: stored table → populate relation display → flatten → audit drop. */
  val ep3Export = q("ep3_engine_export",
    """SELECT s_suppkey, s_name AS sname, n_name AS nation_name
      |FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey""".stripMargin) { (s, dir) =>
    val nation = Tables.nation(s, dir)
    val stored = Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_name").as("sname"),
        col("s_nationkey").cast("long").as("nation"), lit("2024").as("createdAt"))
    val engine = new Engine(s, registry, {
      case "api::nation.nation" => (nation, "n_nationkey")
      case "api::supplier.supplier" => (stored, "s_suppkey")
    })
    engine.exportCsv("api::supplier.supplier", limit = 100000)
      .withColumnRenamed("nation.n_name", "nation_name")
  }

  /** EP4: component flatten driven through Engine.exportCsv — a stored
    * table with a single component struct AND a repeatable component array
    * exports to dot-notation columns (N4) with the audit drop (P8), all
    * composed by the facade rather than called operator-by-operator.
    */
  val ep4ComponentExport = q("ep4_component_export",
    """SELECT s_suppkey, s_name AS sname,
      |       'st ' || CAST(s_nationkey AS VARCHAR) AS addr_street,
      |       CAST(s_acctbal AS VARCHAR) AS addr_phone,
      |       't' || CAST(s_suppkey % 3 AS VARCHAR) AS tags_1_label,
      |       'x' AS tags_2_label
      |FROM supplier ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    val addrComp = ComponentType("test.addr", Seq(
      Attribute("street", AttrKind.StringK), Attribute("phone", AttrKind.StringK)))
    val tagComp = ComponentType("test.tag", Seq(Attribute("label", AttrKind.StringK)))
    val shopCt = ContentType("api::shop.shop", "Shop", Seq(
      Attribute("sname", AttrKind.StringK),
      Attribute("addr", AttrKind.ComponentK, component = Some("test.addr")),
      Attribute("tags", AttrKind.ComponentK, component = Some("test.tag"),
        repeatable = true)))
    val reg = ContentTypeRegistry(Seq(shopCt), Seq(addrComp, tagComp))
    val stored = Tables.supplier(s, dir).select(
      col("s_suppkey"), col("s_name").as("sname"),
      struct(concat(lit("st "), col("s_nationkey").cast("string")).as("street"),
        col("s_acctbal").cast("string").as("phone")).as("addr"),
      array(
        struct(concat(lit("t"), (col("s_suppkey") % 3).cast("string")).as("label")),
        struct(lit("x").as("label"))).as("tags"),
      lit("2024").as("createdAt"))
    val engine = new Engine(s, reg, { case "api::shop.shop" => (stored, "s_suppkey") })
    engine.exportCsv("api::shop.shop", limit = 1000000)
      .withColumnRenamed("addr.street", "addr_street")
      .withColumnRenamed("addr.phone", "addr_phone")
      .withColumnRenamed("tags.1.label", "tags_1_label")
      .withColumnRenamed("tags.2.label", "tags_2_label")
  }

  /** EP5: full-system closure — CSV-shaped strings imported through the
    * Engine (validate → resolve the nation relation to ids → merge), then
    * the merged table exported back through the Engine (populate the
    * relation display value → audit drop). Import∘export must reproduce
    * the original human-readable values.
    */
  val ep5Roundtrip = q("ep5_roundtrip",
    """SELECT s_name AS sname, round(s_acctbal, 2) AS acctbal, n_name AS nation_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey""".stripMargin) { (s, dir) =>
    val nation = Tables.nation(s, dir)
    val csv = Tables.supplier(s, dir)
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name").as("sname"),
        col("n_name").as("nation.n_name"),
        col("s_acctbal").cast("string").as("acctbal"),
        lit("yes").as("active"))
    val emptyTarget = s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("sname", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("nation", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("acctbal", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("active", org.apache.spark.sql.types.BooleanType))))
    // phase 1: import — relation resolved to ids
    val importEngine = new Engine(s, registry, {
      case "api::nation.nation" => (nation, "n_nationkey")
      case "api::supplier.supplier" => (emptyTarget, "sname")
    })
    val imported = importEngine
      .importCsv(csv, "api::supplier.supplier", upsert = true, upsertField = "sname")
      .merged
    // phase 2: export the merged table — ids populated back to names
    val exportEngine = new Engine(s, registry, {
      case "api::nation.nation" => (nation, "n_nationkey")
      case "api::supplier.supplier" => (imported, "sname")
    })
    exportEngine.exportCsv("api::supplier.supplier", limit = 1000000)
      .select(col("sname"), round(col("acctbal"), 2).as("acctbal"),
        graft.functions.Cols.qcol("nation.n_name").as("nation_name"))
  }

  // ---------------------------------------------------------------- media
  private val albumCt = ContentType("api::album.album", "Album", Seq(
    Attribute("code", AttrKind.StringK, required = true),
    Attribute("title", AttrKind.StringK),
    Attribute("image", AttrKind.MediaK),
    Attribute("document", AttrKind.MediaK)))
  private val albumRegistry = ContentTypeRegistry(Seq(albumCt))

  /** Input prep (driver-side, small): one media.zip with folder-structured
    * entries derived from the documents table, plus system junk and
    * root-level strays that the pipeline must ignore.
    */
  def stageMediaZip(s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val zipDir = s"/tmp/graft_mediazip/${Staging.tag(dir)}"
    // deterministic content per sf dir — reuse across the queries that
    // share it instead of rebuilding (input prep, not pipeline work)
    if (new java.io.File(s"$zipDir/media.zip").exists()) return zipDir
    val d = new java.io.File(zipDir)
    if (d.exists()) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(d.toPath).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    d.mkdirs()
    // fixture staging, not a query path: the archive is an inherently
    // LOCAL artifact (it mirrors the reference's uploaded zip), so entry
    // names stream through the driver via toLocalIterator — one
    // partition resident at a time, never the corpus — behind a loud cap
    // that sizes the FIXTURE (a 100k-entry zip is already implausible as
    // a test upload). Do not copy this shape into a query path.
    val idDf = Tables.documents(s, dir).select(col("doc_id"))
      .orderBy(col("doc_id"))
    val n = idDf.count()
    require(n <= 100000,
      s"media-zip fixture staging caps at 100k entries, got $n")
    import scala.jdk.CollectionConverters._
    val ids = idDf.toLocalIterator().asScala.map(_.getLong(0))
    // write to a temp name and rename after close: the reuse check above
    // keys on media.zip existing, which must imply a COMPLETE archive
    val tmpZip = s"$zipDir/media.zip.tmp"
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(tmpZip))
    def put(name: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(name.getBytes("UTF-8")); zos.closeEntry()
    }
    put("__MACOSX/._junk") // system — dropped by the scan
    put(".DS_Store")       // dotfile — dropped by the scan
    put("stray.txt")       // root-level — ignored (depth < 2)
    put("notes/readme.txt") // unbucketed folder — dropped in structured mode
    ids.foreach { i =>
      if (i % 2 == 0) put(s"image/K${i}_1.png")
      if (i % 3 == 0) put(s"document/K$i.pdf")
    }
    zos.close()
    java.nio.file.Files.move(java.nio.file.Paths.get(tmpZip),
      java.nio.file.Paths.get(s"$zipDir/media.zip"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    zipDir
  }

  private val mediaIdsSql =
    """files AS (
      |  SELECT 'image/K' || CAST(doc_id AS VARCHAR) || '_1.png' AS path
      |  FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT 'document/K' || CAST(doc_id AS VARCHAR) || '.pdf'
      |  FROM documents WHERE doc_id % 3 = 0),
      |ids AS (SELECT path, row_number() OVER (ORDER BY path) AS file_id FROM files),
      |f AS (SELECT file_id, string_split(path, '/')[1] AS field,
      |             string_split(path, '/')[-1] AS name
      |      FROM ids)""".stripMargin

  /** S6 (+J8/S9 composition): the uploadMediaZip mapping — REAL zip scan,
    * folder bucketing, upload-once dedup, distributed deterministic ids.
    */
  val s6ZipBucketing = q("s6_zip_bucketing",
    s"""WITH $mediaIdsSql
       |SELECT field, file_id, name FROM f""".stripMargin) { (s, dir) =>
    val zipDir = stageMediaZip(s, dir)
    val engine = new Engine(s, albumRegistry,
      _ => throw new UnsupportedOperationException("no stored tables needed"))
    engine.uploadMediaZip(zipDir, "api::album.album")
      .select(col("field"), col("file_id"), col("name"))
  }

  /** EP-media: the FULL media import composition through the Engine —
    * upload-media-zip → importCsv(mediaFiles) attaches sorted matched file
    * ids per media field (reference: controllers/csv-import.js:267-272 →
    * services/csv-import.js:377-379, :1201-1246). Prefix semantics: code
    * 'K2' also matches 'K20…' files, faithfully on both sides.
    */
  val epMediaImport = q("ep_media_import",
    s"""WITH $mediaIdsSql,
       |recs AS (SELECT 'K' || CAST(doc_id AS VARCHAR) AS code, source AS title
       |         FROM documents),
       |m AS (SELECT r.code, f.field, f.file_id, f.name
       |      FROM recs r JOIN f ON starts_with(lower(f.name), lower(r.code))),
       |agg AS (SELECT code, field,
       |               array_to_string(list(file_id ORDER BY name, file_id), ',') AS ids
       |        FROM m GROUP BY code, field)
       |SELECT r.code, r.title,
       |       i.ids AS image_ids, d.ids AS document_ids
       |FROM recs r
       |LEFT JOIN (SELECT code, ids FROM agg WHERE field = 'image') i USING (code)
       |LEFT JOIN (SELECT code, ids FROM agg WHERE field = 'document') d USING (code)""".stripMargin) {
    (s, dir) =>
      val zipDir = stageMediaZip(s, dir)
      val target = s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        albumCt.sparkType(albumRegistry))
      val engine = new Engine(s, albumRegistry,
        { case "api::album.album" => (target, "code") })
      val media = engine.uploadMediaZip(zipDir, "api::album.album")
      val csv = Tables.documents(s, dir)
        .select(concat(lit("K"), col("doc_id")).as("code"), col("source").as("title"))
      engine.importCsv(csv, "api::album.album", upsert = false, upsertField = "code",
          mediaFiles = Some(media))
        .merged
        .filter(col("code").isNotNull)
        .select(col("code"), col("title"),
          array_join(transform(col("image"), x => x.cast("string")), ",").as("image_ids"),
          array_join(transform(col("document"), x => x.cast("string")), ",").as("document_ids"))
  }

  val all: Seq[QueryDef] =
    Seq(ep1Import, ep3Export, ep4ComponentExport, ep5Roundtrip,
      s6ZipBucketing, epMediaImport)
}
