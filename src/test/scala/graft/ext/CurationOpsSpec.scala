package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 curation operators: binary-quantization ANN, exact
  * set-similarity join, Naive Bayes routing, SCD2 history.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("signSketch packs sign bits little-endian per 64-dim word, padding short tails") {
    // dim 70: word 0 = bits 0..63, word 1 = bits 64..69 (high bits clear)
    val v = Array.tabulate(70)(i => if (i == 0 || i == 3 || i == 65) 1.0f else -1.0f)
    val row = Seq(Tuple1(v)).toDF("v")
      .select(Similarity.signSketch(col("v"), 70).as("s"))
      .head().getSeq[Long](0)
    row should have size 2
    row(0) shouldBe ((1L << 0) | (1L << 3))
    row(1) shouldBe (1L << 1)
  }

  test("signHamming equals the per-dimension sign-disagreement count") {
    val a = Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val b = Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else -1.0f)
    val expected = (0 until 64).count(i => (i % 2 == 0) != (i % 3 == 0))
    val got = Seq((a, b)).toDF("a", "b")
      .select(Similarity.signHamming(
        Similarity.signSketch(col("a"), 64),
        Similarity.signSketch(col("b"), 64)).as("h"))
      .head().getInt(0)
    got shouldBe expected
  }

  test("binarySketchTopK with a corpus-sized shortlist equals brute force") {
    val rnd = new scala.util.Random(7)
    val corpus = (0L until 40L).map(i => (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 3)
    val bq = Similarity.binarySketchTopK(queries, corpus, "vec_id", "embedding",
      dim = 64, k = 5, shortlist = 40)
    val bf = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 5)
    bq.collect().toSet shouldBe bf.collect().toSet
  }

  test("binarySketchTopK ranks an exact duplicate vector first") {
    val rnd = new scala.util.Random(11)
    val base = (0L until 30L).map(i => (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val corpus = (base :+ ((99L, base(2)._2))).toDF("vec_id", "embedding")
    val top = Similarity.binarySketchTopK(corpus.filter(col("vec_id") === 2),
        corpus, "vec_id", "embedding", dim = 64, k = 1, shortlist = 8)
      .head()
    top.getAs[Long]("neighbor_id") shouldBe 99L
    top.getAs[Double]("cosine") shouldBe 1.0 +- 1e-9
  }

  test("setSimJoin equals the naive all-pairs jaccard join") {
    val rnd = new scala.util.Random(3)
    val vocab = ('a' to 'p').map(_.toString)
    val docs = (0L until 60L).map { i =>
      (i, rnd.shuffle(vocab).take(4 + rnd.nextInt(5)).toArray)
    }.toDF("id", "toks")
    val got = Joins.setSimJoin(docs, "id", "toks", minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // naive reference
    val sets = docs.collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet))
    val expected = (for {
      (ia, ta) <- sets; (ib, tb) <- sets if ia < ib
      j = ta.intersect(tb).size.toDouble / ta.union(tb).size
      if j >= 0.5
    } yield (ia, ib, math.rint(j * 10000) / 10000)).toSet
    got shouldBe expected
  }

  test("setSimJoin at tau=1.0 finds exactly the equal-set pairs") {
    val docs = Seq(
      (1L, Array("x", "y", "z")), (2L, Array("z", "y", "x")),
      (3L, Array("x", "y")), (4L, Array("x", "y", "w"))).toDF("id", "toks")
    val got = Joins.setSimJoin(docs, "id", "toks", minJaccard = 1.0)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    got shouldBe Set((1L, 2L))
  }

  // ---- deterministic distributed logistic regression -----------------

  /** Linearly separable synthetic set: y = 1 iff x1 + x2 > 0. */
  private def lrFrame(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      (i.toLong, x1, x2, if (x1 + x2 > 0) 1.0 else 0.0)
    }.toDF("id", "x1", "x2", "y")
  }

  test("trainLogistic is bit-identical across partitionings") {
    val df = lrFrame(500, 21)
    val feats = Seq(col("x1"), col("x2"))
    val w1 = Classify.trainLogistic(df, feats, col("y"), iters = 6)
    val w2 = Classify.trainLogistic(df.repartition(7), feats, col("y"), iters = 6)
    val w3 = Classify.trainLogistic(df.repartition(1), feats, col("y"), iters = 6)
    // EXACT equality — the fixed-point BIGINT gradient reduction makes the
    // trajectory independent of partition count and combine order
    w1.toSeq shouldBe w2.toSeq
    w1.toSeq shouldBe w3.toSeq
  }

  test("trainLogistic learns a separable boundary and squared loss falls") {
    val train = lrFrame(500, 22)
    val test0 = lrFrame(200, 23)
    def mse(iters: Int): Double = {
      val w = Classify.trainLogistic(train, Seq(col("x1"), col("x2")), col("y"),
        iters = iters, lr = 2.0)
      Classify.scoreLogistic(test0, "id", Seq(col("x1"), col("x2")), w)
        .join(test0, "id")
        .select(avg(pow(col("prob_q").cast("double") / 1e6 - col("y"), 2)))
        .head().getDouble(0)
    }
    val m1 = mse(1); val m12 = mse(12)
    m12 should be < m1
    val w = Classify.trainLogistic(train, Seq(col("x1"), col("x2")), col("y"),
      iters = 12, lr = 2.0)
    val acc = Classify.scoreLogistic(test0, "id", Seq(col("x1"), col("x2")), w)
      .join(test0, "id")
      .select(avg(when(col("predicted").cast("double") === col("y"), 1.0)
        .otherwise(0.0)))
      .head().getDouble(0)
    acc should be >= 0.95
  }

  test("scoreLogistic: prob_q/predicted match the closed form") {
    val w = Array(0.25, 1.0) // z = 0.25 + x
    val out = Classify.scoreLogistic(Seq((1L, 0.75), (2L, -1.25), (3L, -0.25))
        .toDF("id", "x"), "id", Seq(col("x")), w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toList.sorted
    def pq(z: Double): Long = math.floor((0.5 + z / (2.0 * (1.0 + math.abs(z)))) * 1e6).toLong
    out shouldBe List((1L, pq(1.0), 1), (2L, pq(-1.0), 0), (3L, pq(0.0), 1))
  }

  test("naive bayes classifies by token evidence; OOV tokens carry none") {
    val train = Seq(
      (1L, "spark scala jvm", "code"), (2L, "jvm scala build", "code"),
      (3L, "scala spark shuffle", "code"),
      (4L, "bread oven flour", "food"), (5L, "flour bread salt", "food"),
      (6L, "oven salt bread", "food")).toDF("doc_id", "text", "topic")
    val model = Classify.trainNaiveBayes(train, split(col("text"), " "), "topic")
    model.vocabSize shouldBe 9
    val test0 = Seq((10L, "scala jvm zzz-oov"), (11L, "bread flour zzz-oov"))
      .toDF("doc_id", "text")
    val out = Classify.classifyNaiveBayes(model, test0, "doc_id", split(col("text"), " "))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    out shouldBe Map(10L -> "code", 11L -> "food")
  }

  test("naive bayes argmax tie breaks by label ascending") {
    // perfectly symmetric classes: equal priors, mirrored token counts
    val train = Seq(
      (1L, "aa bb", "c1"), (2L, "aa bb", "c2")).toDF("doc_id", "text", "topic")
    val model = Classify.trainNaiveBayes(train, split(col("text"), " "), "topic")
    val out = Classify.classifyNaiveBayes(model,
        Seq((9L, "aa")).toDF("doc_id", "text"), "doc_id", split(col("text"), " "))
      .head()
    out.getString(1) shouldBe "c1"
  }

  test("hard negatives exclude same-label neighbors; a different-label duplicate ranks first") {
    val rnd = new scala.util.Random(13)
    val base = (0L until 30L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat), (i % 3).toInt))
    // vec 99: identical to vec 0 but with a different label — the
    // canonical hard negative; vec 0's same-label twins must never appear
    val corpus = (base :+ ((99L, base(0)._2, 2))).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegativesTopK(corpus.filter(col("vec_id") === 0),
      corpus, "vec_id", "embedding", "label", k = 10).collect()
    out.head.getAs[Long]("neighbor_id") shouldBe 99L
    val sameLabel = base.filter(_._3 == 0).map(_._1).toSet
    out.map(_.getAs[Long]("neighbor_id")).toSet.intersect(sameLabel) shouldBe empty
  }

  test("bigram perplexity matches the hand-computed add-1 model; short docs keep a null row") {
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramPerplexity(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).sortBy(_._1)
    // corpus: c2(a,b)=3, c2(b,a)=1; cp(a)=3, cp(b)=1; V=3
    val pAB = math.log((3 + 1.0) / (3 + 3.0))
    val pBA = math.log((1 + 1.0) / (1 + 3.0))
    out(0)._2 shouldBe 3L
    out(0)._3.get shouldBe math.exp(-(pAB + pBA + pAB) / 3) +- 1e-9
    out(1)._2 shouldBe 1L
    out(1)._3.get shouldBe math.exp(-pAB) +- 1e-9
    out(2) shouldBe ((3L, 0L, None))
  }

  test("contamination report counts distinct shared n-grams per (doc, eval) pair") {
    val docs = Seq(
      (1L, "a b c d e f"), // shares the 3 grams of "b c d e" + head gram with eval 10
      (2L, "z z z z"),     // clean
      (10L, "a b c d e")).toDF("doc_id", "text")
    val out = CorpusClean.contaminationReport(docs, "doc_id", "text",
        docs.filter(col("doc_id") === 10), "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // eval doc 10 has grams {abc, bcd, cde}; doc 1 shares all three
    out shouldBe Map((1L, 10L) -> 3L, (10L, 10L) -> 3L)
  }

  test("leakage-safe split: duplicates share a split; null texts are singleton groups") {
    val docs = Seq(
      (1L, "same text"), (2L, "same text"), (3L, "same text"),
      (4L, "other"), (5L, null), (6L, null)).toDF("doc_id", "text")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", col("text"), 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    out(1L) shouldBe out(2L)
    out(2L) shouldBe out(3L)
    // null-text rows hash on their OWN id: md5("5") vs md5("6") — the
    // group window must not have merged them (distinct assignment is
    // data-dependent; the invariant is each uses its own canonical)
    val md5_5 = java.security.MessageDigest.getInstance("MD5")
      .digest("5".getBytes).map("%02x".format(_)).mkString
    out(5L) shouldBe (if (md5_5 < Sampling.rateToHex(0.5)) "train" else "test")
  }

  test("stratifiedTopK keeps exactly k per stratum (all of an undersized stratum), deterministically") {
    val df = ((1 to 20).map(i => (i.toLong, "big")) ++ Seq((100L, "small")))
      .toDF("id", "src")
    val out = Sampling.stratifiedTopK(df, col("src"), col("id"), 3)
      .collect().map(r => (r.getString(1), r.getLong(0)))
    out.count(_._1 == "big") shouldBe 3
    out.count(_._1 == "small") shouldBe 1
    // determinism: a rerun picks the identical rows
    Sampling.stratifiedTopK(df, col("src"), col("id"), 3)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet shouldBe out.toSet
  }

  test("compressionRatio: bounded, repeated text compresses strictly better, empty scores 1.0") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "")).toDF("id", "text")
    val out = df.select(col("id"),
        TextAnalysis.compressionRatio(col("text")).as("r1"),
        TextAnalysis.compressionRatio(
          concat_ws(" ", col("text"), col("text"), col("text"), col("text"))).as("r4"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    out(1L)._1 should (be > 0.0 and be <= 1.2)
    out(1L)._2 should be < out(1L)._1
    out(2L)._1 shouldBe 1.0
  }

  test("scd2 intervals collapse runs, tile half-open, and flag the current row") {
    val log = Seq(
      (1L, 10L, 100L, "bronze"), (1L, 20L, 101L, "bronze"),
      (1L, 30L, 102L, "gold"), (1L, 40L, 103L, "bronze"),
      (2L, 10L, 104L, "gold")).toDF("user_id", "ts", "event_id", "tier")
    val out = Scd2.intervals(log, "user_id", "ts", "event_id", "tier")
      .orderBy(col("user_id"), col("valid_from"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4), r.getBoolean(5)))
    out shouldBe Array(
      (1L, "bronze", 10L, Some(30L), 2L, false),
      (1L, "gold", 30L, Some(40L), 1L, false),
      (1L, "bronze", 40L, None, 1L, true),
      (2L, "gold", 10L, None, 1L, true))
  }

  test("scd2 equal-timestamp observations order by the tiebreaker") {
    val log = Seq(
      (1L, 10L, 2L, "b"), (1L, 10L, 1L, "a"), (1L, 20L, 3L, "b"))
      .toDF("user_id", "ts", "event_id", "attr")
    val out = Scd2.intervals(log, "user_id", "ts", "event_id", "attr")
      .orderBy(col("valid_from"), col("attr"))
      .select(col("attr"), col("n_rows")).as[(String, Long)].collect()
    // order at ts=10 is (event 1: a, event 2: b); the b run then absorbs ts=20
    out shouldBe Array(("a", 1L), ("b", 2L))
  }

  test("keepTopFraction keeps exactly floor(frac*n), splitting threshold ties by id") {
    val rnd = new scala.util.Random(29)
    val df = (0L until 97L).map(i => (i, rnd.nextInt(10).toLong)).toDF("id", "score")
    val out = Sampling.keepTopFraction(df, col("score"), "id", 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    out.count(_._3) shouldBe 24 // floor(0.25 * 97)
    // equality with the global-sort reference, tie-split included
    val expected = out.map(x => (x._1, x._2)).sortBy(x => (-x._2, x._1))
      .take(24).map(_._1).toSet
    out.filter(_._3).map(_._1).toSet shouldBe expected
    // frac edges
    Sampling.keepTopFraction(df, col("score"), "id", 0.0)
      .filter(col("kept")).count() shouldBe 0L
    Sampling.keepTopFraction(df, col("score"), "id", 1.0)
      .filter(col("kept")).count() shouldBe 97L
  }

  test("keepTopFraction: an all-equal-score corpus takes the k smallest ids") {
    val df = (0L until 10L).map(i => (i, 7L)).toDF("id", "score")
    Sampling.keepTopFraction(df, col("score"), "id", 0.5)
      .filter(col("kept")).select("id").as[Long].collect().sorted shouldBe
      Array(0L, 1L, 2L, 3L, 4L)
  }

  test("keepTopFraction: null scores sort last and the budget stays exact") {
    val df = Seq((1L, Some(9L)), (2L, None), (3L, Some(5L)), (4L, None))
      .toDF("id", "score")
    // k = 3 reaches INTO the null group: the two real scores plus the
    // smallest-id null row
    Sampling.keepTopFraction(df, col("score"), "id", 0.75)
      .filter(col("kept")).select("id").as[Long].collect().sorted shouldBe
      Array(1L, 2L, 3L)
  }
}
