package graft.api

import graft.SparkSpec
import graft.registry._
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._

/** Cache-lifecycle discipline: a long-lived session running imports and ANN
  * queries must not accumulate cached plans. Operator-internal
  * materializations are lineage-cut localCheckpoints (never registered with
  * the cache manager); the one caller-visible persist (the import's media
  * library) is released by `ImportResult.release()`.
  */
class CacheLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private val dimCt = ContentType("api::c.dim", "Dim", Seq(
    Attribute("dname", AttrKind.StringK)))
  private val rowCt = ContentType("api::c.row", "Row", Seq(
    Attribute("wname", AttrKind.StringK, required = true),
    Attribute("qty", AttrKind.IntegerK),
    Attribute("ref", AttrKind.RelationK, target = Some("api::c.dim"),
      relationKind = Some("manyToOne")),
    Attribute("pic", AttrKind.MediaK)))
  private val registry = ContentTypeRegistry(Seq(dimCt, rowCt))

  test("importCsv consumed + release() leaves the cache manager empty") {
    spark.catalog.clearCache()
    val dim = Seq((1L, "a"), (2L, "b")).toDF("id", "dname")
    val csv = Seq(("w1", "1", "a"), ("w2", "2", "b"), ("w1", "3", "a"))
      .toDF("wname", "qty", "ref.dname")
    val media = Seq(("pic", 1L, "w1_1.png", "w1_1.png", "image/png", 3L))
      .toDF("field", "file_id", "name", "path", "mime", "size")
    val target = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], rowCt.sparkType(registry))
    val engine = new Engine(spark, registry, {
      case "api::c.dim" => (dim, "id")
      case "api::c.row" => (target, "wname")
    })
    val res = engine.importCsv(csv, "api::c.row", upsert = true,
      upsertField = "wname", mediaFiles = Some(media))
    res.merged.write.format("noop").mode("overwrite").save()
    res.created shouldBe 2L
    res.updated shouldBe 0L
    res.errors shouldBe empty
    GraftSqlBridge.cacheIsEmpty(spark) shouldBe false // media library cached
    res.release()
    GraftSqlBridge.cacheIsEmpty(spark) shouldBe true
  }

  test("ivfTopK round trip leaves the cache manager empty") {
    spark.catalog.clearCache()
    val emb = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 31 + d) % 7).toFloat)))
      .toDF("vec_id", "embedding")
    val out = graft.ext.Similarity.ivfTopK(
      emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding", 3,
      nlist = 4, nprobe = 2)
    out.count() should be > 0L
    GraftSqlBridge.cacheIsEmpty(spark) shouldBe true
  }
}
