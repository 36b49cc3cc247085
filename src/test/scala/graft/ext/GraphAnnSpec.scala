package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Graph-ANN layout: build invariants (exact edge lists, medoid entry),
  * beam-search serving behavior, and the guard rails.
  */
class GraphAnnSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.delete()
    d.getAbsolutePath
  }

  // two well-separated clusters of 10 + a bridge point, 4-dim
  private def corpus = {
    def v(base: Array[Float], i: Int) =
      base.zipWithIndex.map { case (x, j) => x + 0.01f * ((i * 7 + j) % 5) }
    val a = (0 until 10).map(i => (i.toLong, v(Array(1f, 0f, 0f, 0.1f), i)))
    val b = (10 until 20).map(i => (i.toLong, v(Array(0f, 1f, 0.1f, 0f), i)))
    (a ++ b :+ ((20L, Array(0.7f, 0.7f, 0.05f, 0.05f))))
      .toDF("vec_id", "embedding")
  }

  test("build: adjacency is the exact top-degree set; entry is the medoid") {
    val dir = tmpDir("graft_graphann")
    GraphAnn.build(corpus, "vec_id", "embedding", dir, degree = 4)
    val adj = spark.read.parquet(s"$dir/adjacency")
      .as[(Long, Seq[Long])].collect().toMap
    adj.size shouldBe 21
    adj.values.foreach(_.size shouldBe 4)
    // spot-check one node against brute force
    val expected = Similarity.bruteForceTopK(
        corpus.filter($"vec_id" === 0), corpus, "vec_id", "embedding", 4)
      .select($"neighbor_id").as[Long].collect().toSet
    adj(0L).toSet shouldBe expected
    // entry: max rounded cosine to the mean — the bridge point sits
    // between the clusters and wins
    spark.read.parquet(s"$dir/entry").head().getLong(0) shouldBe 20L
  }

  test("serving: beam search matches brute force on the connected graph") {
    val dir = tmpDir("graft_graphann2")
    GraphAnn.build(corpus, "vec_id", "embedding", dir, degree = 6)
    val queries = corpus.filter($"vec_id".isin(0L, 15L, 20L))
    val served = GraphAnn.topK(spark, dir, queries, "vec_id", "embedding",
        k = 3, beamWidth = 8, hops = 4)
      .select($"query_id", $"rank", $"neighbor_id").collect().toSet
    val brute = Similarity.bruteForceTopK(queries, corpus,
        "vec_id", "embedding", 3)
      .select($"query_id", $"rank", $"neighbor_id").collect().toSet
    served shouldBe brute
  }

  test("deletes: tombstoned ids route but never serve; compact splices edges through the dead") {
    val dir = tmpDir("graft_graphann_del")
    GraphAnn.build(corpus, "vec_id", "embedding", dir, degree = 6)
    val queries = corpus.filter($"vec_id".isin(0L, 15L))
    def served() = GraphAnn.topK(spark, dir, queries, "vec_id", "embedding",
        k = 3, beamWidth = 8, hops = 4)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    // delete two cluster members (the entry/bridge stays — losing the
    // sole zero-in-degree connector is a documented REBUILD case)
    AnnIndex.deleteIds(spark, dir, Seq(1L, 11L).toDF("vec_id"), "vec_id")
    val afterDelete = served()
    afterDelete.map(_._2) should contain noneOf (1L, 11L)
    // the lazily-deleted view equals brute force over the survivors
    // (dead nodes still route, so navigation holds through tombstones)
    val brute = Similarity.bruteForceTopK(queries,
        corpus.filter(!$"vec_id".isin(1L, 11L)),
        "vec_id", "embedding", 3)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    afterDelete shouldBe brute
    // health sees the debt; the sweep-facing debt routes compaction
    val h = AnnIndex.healthReport(spark, Seq("g" -> dir)).head()
    h.getAs[Long]("total_rows") shouldBe 21L
    h.getAs[Long]("live_rows") shouldBe 19L
    AnnIndex.compactIfNeeded(spark, dir, threshold = 0.05) shouldBe true
    graft.util.Hfs.exists(spark, s"$dir/tombstones") shouldBe false
    spark.read.parquet(s"$dir/vectors").count() shouldBe 19L
    // edges through the dead nodes were spliced: no list references
    // them, every list is back at the stored degree bound
    val adj = spark.read.parquet(s"$dir/adjacency")
      .as[(Long, Seq[Long])].collect()
    adj.flatMap(_._2).toSet should contain noneOf (1L, 11L)
    adj.foreach(_._2.size should be <= 6)
    // serving unchanged across the consolidation
    served() shouldBe afterDelete
  }

  test("compact re-seats a dead entry on the live medoid; fully-tombstoned refuses") {
    // one well-connected blob, so connectivity survives any single loss
    val blob = (0 until 12).map(i => (i.toLong,
        Array(1f + 0.01f * (i % 5), 0.5f + 0.01f * ((i * 3) % 7),
          0.2f + 0.01f * ((i * 5) % 3), 0.1f)))
      .toDF("vec_id", "embedding")
    val dir = tmpDir("graft_graphann_entry")
    GraphAnn.build(blob, "vec_id", "embedding", dir, degree = 5)
    val entry0 = spark.read.parquet(s"$dir/entry").head().getLong(0)
    AnnIndex.deleteIds(spark, dir, Seq(entry0).toDF("vec_id"), "vec_id")
    GraphAnn.compact(spark, dir)
    val entry1 = spark.read.parquet(s"$dir/entry").head().getLong(0)
    entry1 should not be entry0
    // post-consolidation serving equals brute force over survivors
    val queries = blob.filter($"vec_id" === (entry0 + 1) % 12)
    GraphAnn.topK(spark, dir, queries, "vec_id", "embedding",
        k = 3, beamWidth = 8, hops = 4)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet shouldBe
      Similarity.bruteForceTopK(queries, blob.filter($"vec_id" =!= entry0),
          "vec_id", "embedding", 3)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    // fsck audits the graph store like any ANN layout: post-compaction
    // the survivor set is consistent against the survivor base, and the
    // full base flags exactly the one missing id
    StoreMaintenance.fsck(spark, blob.filter($"vec_id" =!= entry0)
        .select($"vec_id"), "vec_id",
        Seq(StoreRef("g", "ann", dir)))
      .head().getAs[Boolean]("consistent") shouldBe true
    val audit = StoreMaintenance.fsck(spark, blob.select($"vec_id"),
      "vec_id", Seq(StoreRef("g", "ann", dir))).head()
    audit.getAs[Long]("missing_ids") shouldBe 1L
    audit.getAs[Long]("orphan_ids") shouldBe 0L
    // fully-tombstoned refuses loudly
    AnnIndex.deleteIds(spark, dir, blob.select($"vec_id"), "vec_id")
    intercept[IllegalArgumentException] {
      GraphAnn.compact(spark, dir)
    }
  }

  test("guards: wrong layout, beam narrower than k, bad hops all refuse") {
    val dir = tmpDir("graft_graphann3")
    GraphAnn.build(corpus, "vec_id", "embedding", dir, degree = 4)
    intercept[IllegalArgumentException] {
      GraphAnn.topK(spark, dir, corpus, "vec_id", "embedding",
        k = 5, beamWidth = 3)
    }
    intercept[IllegalArgumentException] {
      GraphAnn.topK(spark, dir, corpus, "vec_id", "embedding",
        k = 2, beamWidth = 4, hops = 0)
    }
    // a non-graph dir refuses through the layout check
    val pq = tmpDir("graft_graphann4")
    AnnIndex.buildPq(corpus, "vec_id", "embedding", pq, m = 2, ksub = 4,
      iters = 1)
    intercept[IllegalArgumentException] {
      GraphAnn.topK(spark, pq, corpus, "vec_id", "embedding", k = 2,
        beamWidth = 4)
    }
  }
}
