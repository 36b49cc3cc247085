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
