package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic training-shard export: re-export reproducibility,
  * sequence/shard integrity, manifest reconcile, and shard balance.
  */
class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.delete()
    d.getAbsolutePath
  }

  // a few hundred sequences' worth of packed rows from a synthetic corpus
  private def packed = {
    val docs = (0 until 300).map(i =>
      (i.toLong, (1 to (i % 50) + 10).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    Packing.packSequences(docs, "doc_id", "text", 16)
      .localCheckpoint(eager = true)
  }

  private def dataFileOf(shardDir: java.io.File): java.io.File = {
    val fs = shardDir.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    fs.length shouldBe 1 // one deterministically-ordered file per shard
    fs.head
  }

  test("re-export is byte-identical per shard; a sequence never splits shards") {
    val p = packed
    val (d1, d2) = (tmpDir("graft_shards1"), tmpDir("graft_shards2"))
    val m1 = ShardExport.export(spark, p, 8, d1).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val m2 = ShardExport.export(spark, p, 8, d2).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getString(2)))).toMap
    m1 shouldBe m2
    m1.keySet shouldBe (0 until 8).toSet // every shard non-empty here
    (0 until 8).foreach { s =>
      val f1 = dataFileOf(new java.io.File(d1, s"shard_id=$s"))
      val f2 = dataFileOf(new java.io.File(d2, s"shard_id=$s"))
      java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(f1.toPath),
        java.nio.file.Files.readAllBytes(f2.toPath)) shouldBe true
    }
    // a sequence is the training unit: all rows of a seq_id in ONE shard
    spark.read.parquet(d1).groupBy($"seq_id")
      .agg(countDistinct($"shard_id").as("n"))
      .filter($"n" =!= 1).count() shouldBe 0L
    // balance: deterministic hash assignment spreads sequences evenly
    // enough that no shard exceeds twice the mean
    val rows = m1.values.map(_._1)
    rows.max should be <= 2 * (rows.sum / rows.size)
  }

  test("within-shard physical order is the order_key sort; verify() reconciles") {
    val dst = tmpDir("graft_shards3")
    ShardExport.export(spark, packed, 4, dst)
    (0 until 4).foreach { s =>
      val keys = spark.read
        .parquet(new java.io.File(dst, s"shard_id=$s").getAbsolutePath)
        .select($"order_key").as[String].collect().toSeq
      keys shouldBe keys.sorted // read-back order IS the content-key order
    }
    ShardExport.verify(spark, dst)
      .filter(!$"consistent").count() shouldBe 0L
    // tamper one shard: drop its last row and rewrite — reconcile flags
    // exactly that shard
    val s0 = new java.io.File(dst, "shard_id=0").getAbsolutePath
    val torn = spark.read.parquet(s0).limit(1).localCheckpoint(eager = true)
    torn.write.mode("overwrite").parquet(s0)
    val bad = ShardExport.verify(spark, dst).filter(!$"consistent")
      .select($"shard_id").as[Int].collect().toSeq
    bad shouldBe Seq(0)
  }

  test("a wholly missing shard reads as inconsistent, not NULL") {
    val dst = tmpDir("graft_shards5")
    ShardExport.export(spark, packed, 4, dst)
    // delete an ENTIRE shard directory: the recomputed side has no row,
    // so the comparison is one-sided — the worst tear must still land in
    // filter(!consistent), not escape as NULL
    val s1 = new java.io.File(dst, "shard_id=1")
    s1.listFiles().foreach(_.delete())
    s1.delete() shouldBe true
    val v = ShardExport.verify(spark, dst).localCheckpoint(eager = true)
    v.filter($"consistent".isNull).count() shouldBe 0L
    v.filter(!$"consistent").select($"shard_id").as[Int].collect()
      .toSeq shouldBe Seq(1)
    // and the loader-side contract check catches it either way round:
    // filter(consistent).count == manifest rows fails for the torn set
    v.filter($"consistent").count() shouldBe 3L
  }

  test("empty and degenerate inputs fail or pass loudly") {
    intercept[IllegalArgumentException] {
      ShardExport.assign(packed, 0)
    }
    // single shard still works and carries the whole table
    val dst = tmpDir("graft_shards4")
    val m = ShardExport.export(spark, packed, 1, dst).collect()
    m.length shouldBe 1
    m.head.getLong(1) shouldBe packed.count()
  }
}
