package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12 curation/monitoring operators: KMV distinct sketch, PSI
  * drift, declarative expectations, filtered IVF search.
  */
class QualityOpsSpec extends SparkSpec {
  import spark.implicits._

  test("kmv: small groups are exact, large groups estimate within the 1/sqrt(k) band") {
    val df = ((0 until 3).map(i => ("small", s"v$i")) ++
      (0 until 5000).map(i => ("big", s"u$i"))).toDF("g", "v")
    val est = Sketch.kmvDistinct(df, "g", col("v"), 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    est("small") shouldBe 3.0
    est("big") shouldBe 5000.0 +- 5000.0 * 3.0 / math.sqrt(64) // 3 sigma
    // duplicates don't move the estimate; nulls contribute nothing
    val withDups = df.unionByName(df).unionByName(
      Seq(("big", null: String)).toDF("g", "v"))
    Sketch.kmvDistinct(withDups, "g", col("v"), 64)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap shouldBe est
  }

  test("psi: identical snapshots score exactly zero, a shifted one scores high") {
    val ref = (0 until 1000).map(i => ("t", (i % 10).toDouble)).toDF("g", "v")
    val same = Stats.psi(ref, ref, "g", col("v"), bins = 10, lo = 0, hi = 10)
      .head()
    same.getAs[Long]("n_ref") shouldBe 1000L
    same.getAs[Double]("psi") shouldBe 0.0
    val shifted = (0 until 1000).map(i => ("t", (i % 3).toDouble)).toDF("g", "v")
    Stats.psi(ref, shifted, "g", col("v"), bins = 10, lo = 0, hi = 10)
      .head().getAs[Double]("psi") should be > 0.25
    // nulls excluded, out-of-domain clamps into edge bins (still counted)
    val noisy = ref.unionByName(Seq(("t", null.asInstanceOf[java.lang.Double]),
      ("t", java.lang.Double.valueOf(99.0))).toDF("g", "v"))
    Stats.psi(noisy, noisy, "g", col("v"), bins = 10, lo = 0, hi = 10)
      .head().getAs[Long]("n_ref") shouldBe 1001L
  }

  test("expectations: one-pass counts, null predicate counts as violation") {
    val df = Seq((1, Some(5)), (2, Some(50)), (3, None)).toDF("id", "x")
    val rep = Quality.expectations(df, Seq(
        "x_not_null" -> col("x").isNotNull,
        "x_small" -> (col("x") < 10), // null x → null pred → violation
      )).collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    rep("x_not_null") shouldBe ((1L, 3L, false))
    rep("x_small") shouldBe ((2L, 3L, false))
  }

  test("referentialViolations counts dangling non-null FKs only") {
    val fact = Seq(Some(1), Some(2), Some(9), None).toDF("fk")
    val dim = Seq(1, 2, 3).toDF("pk")
    val r = Quality.referentialViolations(fact, "fk", dim, "pk", "fk_in_dim")
      .head()
    r.getAs[Long]("violations") shouldBe 1L // only the 9
    r.getAs[Long]("n_rows") shouldBe 4L
    r.getAs[Boolean]("pass") shouldBe false
  }

  test("filtered ivfTopK equals brute force over the predicate-filtered corpus") {
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 32).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_fivf").toString + "/ivf"
    AnnIndex.buildIvf(corpus, "vec_id", "embedding", dir, nlist = 4, iters = 1)
    val q = corpus.filter($"vec_id" < 2)
    val served = AnnIndex.ivfTopK(spark, AnnIndex.readIvf(spark, dir), q,
        "vec_id", "embedding", 5, nprobe = 4, // full probe → exact
        where = pmod(col("__id"), lit(2)) === 0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(q,
        corpus.filter(pmod($"vec_id", lit(2)) === 0), "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    served shouldBe brute
  }
}
