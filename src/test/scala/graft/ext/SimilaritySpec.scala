package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f)),
    (2L, Array(0.0f, 1.0f)),
    (3L, Array(-1.0f, 0.0f)),
    (4L, Array(0.7f, 0.7f)),
  ).toDF("vec_id", "embedding")

  test("native codegen cosine agrees with the declarative form") {
    val df = Seq(
      (Array(0.3f, -1.2f, 2.5f), Array(1.1f, 0.4f, -0.2f)),
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
    ).toDF("a", "b")
      .select(Similarity.cosine($"a", $"b").as("native"),
        Similarity.cosineDeclarative($"a", $"b").as("decl"))
    df.collect().foreach { r =>
      r.getAs[Double]("native") shouldBe (r.getAs[Double]("decl") +- 1e-12)
    }
  }

  test("cosine null on length mismatch and zero vector") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f), Array(0.0f, 0.0f)))
      .toDF("a", "b", "z")
      .select(Similarity.cosine($"a", $"b").as("mismatch"),
        Similarity.cosine($"a", $"z").as("zero"))
    val r = df.collect().head
    r.isNullAt(0) shouldBe true
    r.isNullAt(1) shouldBe true
  }

  test("cosine of identical and orthogonal vectors") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f), Array(-2.0f, 1.0f)))
      .toDF("a", "b", "c")
      .select(Similarity.cosine($"a", $"b").as("same"), Similarity.cosine($"a", $"c").as("orth"))
    val r = df.collect().head
    r.getAs[Double]("same") shouldBe (1.0 +- 1e-12)
    r.getAs[Double]("orth") shouldBe (0.0 +- 1e-12)
  }

  test("brute-force top-k orders by cosine desc, excludes self") {
    val res = Similarity.bruteForceTopK(corpus.filter($"vec_id" === 0), corpus,
      "vec_id", "embedding", 3).orderBy("rank").collect()
    res.map(_.getAs[Long]("neighbor_id")).toSeq shouldBe Seq(1L, 4L, 2L)
    res.map(_.getAs[Int]("rank")).toSeq shouldBe Seq(1, 2, 3)
  }

  test("hyperplane bucket: scaling preserves bucket, negation flips every bit") {
    val dim = 8
    val df = Seq(
      (Array(1.0f, -2.0f, 0.5f, 3.0f, -1.0f, 0.1f, 2.0f, -0.7f)),
    ).toDF("v")
      .select(
        Similarity.hyperplaneBucket($"v", dim).as("b"),
        Similarity.hyperplaneBucket(transform($"v", x => (x * 2.5f).cast("float")), dim).as("scaled"),
        Similarity.hyperplaneBucket(transform($"v", x => (-x).cast("float")), dim).as("neg"))
    val r = df.collect().head
    r.getAs[Int]("scaled") shouldBe r.getAs[Int]("b")
    r.getAs[Int]("neg") shouldBe (~r.getAs[Int]("b") & 0xFF)
  }

  test("ivf with full probes matches brute force on tiny corpus") {
    val brute = Similarity.bruteForceTopK(corpus.filter($"vec_id" === 0), corpus,
      "vec_id", "embedding", 3).orderBy("rank")
      .select("neighbor_id").as[Long].collect().toSeq
    val ivf = Similarity.ivfTopK(corpus.filter($"vec_id" === 0), corpus,
      "vec_id", "embedding", 3, nlist = 2, nprobe = 2).orderBy("rank")
      .select("neighbor_id").as[Long].collect().toSeq
    ivf shouldBe brute // nprobe = nlist ⇒ exhaustive ⇒ exact
  }
}
