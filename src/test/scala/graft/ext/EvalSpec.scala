package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Retrieval-eval harness: metrics match hand computation, zero-relevant
  * queries grade 0 instead of dropping, and the discount/ideal literal
  * tables are the exact values both the plan and any oracle share.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("discount and ideal-prefix tables") {
    val d = Eval.discounts(3)
    d(0) shouldBe 1.0
    d(1) shouldBe (1.0 / (math.log(3.0) / math.log(2.0)))
    val s = Eval.idealPrefix(3)
    s(0) shouldBe 0.0
    s(1) shouldBe d(0)
    s(3) shouldBe (d(0) + d(1) + d(2))
    // literal round-trips the exact bits
    java.lang.Double.parseDouble(Eval.literal(d(1))) shouldBe d(1)
  }

  test("rankedEval matches hand-computed precision/MRR/NDCG") {
    // query 1: ranks 1..3 = docs 10, 11, 12; relevant = {11, 12, 99}
    //   hits = 2, first hit rank 2, R = 3
    //   prec@3 = 2/3; mrr = 1/2
    //   dcg = D2 + D3; idcg = D1 + D2 + D3
    val ranked = Seq(
      ("s", 1L, 1, 10L), ("s", 1L, 2, 11L), ("s", 1L, 3, 12L),
    ).toDF("system", "query_id", "rank", "neighbor_id")
    val qrels = Seq((1L, 11L), (1L, 12L), (1L, 99L)).toDF("query_id", "doc_id")
    val r = Eval.rankedEval(ranked, qrels, k = 3).head()
    val d = Eval.discounts(3)
    r.getAs[Long]("hits") shouldBe 2L
    r.getAs[Long]("rels") shouldBe 3L
    r.getAs[Long]("first_hit") shouldBe 2L
    r.getAs[Long]("prec_q") shouldBe math.floor(2.0 / 3.0 * 1e6).toLong
    r.getAs[Long]("mrr_q") shouldBe 500000L
    val ndcg = (d(1) + d(2)) / (d(0) + d(1) + d(2))
    r.getAs[Long]("ndcg_q") shouldBe math.floor(ndcg * 1e6).toLong
  }

  test("a perfect ranking grades 1.0 across the board; zero-relevant grades 0") {
    val ranked = Seq(
      ("s", 1L, 1, 11L), ("s", 1L, 2, 12L),
      ("s", 2L, 1, 20L), ("s", 2L, 2, 21L),
    ).toDF("system", "query_id", "rank", "neighbor_id")
    val qrels = Seq((1L, 11L), (1L, 12L)).toDF("query_id", "doc_id")
    val out = Eval.rankedEval(ranked, qrels, k = 2)
      .collect().map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("prec_q"), r.getAs[Long]("mrr_q"),
         r.getAs[Long]("ndcg_q"))).toMap
    out(1L) shouldBe ((1000000L, 1000000L, 1000000L))
    out(2L) shouldBe ((0L, 0L, 0L))
  }

  test("duplicate qrels rows grade identically to the distinct set") {
    // qrels are a SET: a doubled (query, doc) pair must neither fan out
    // ranked rows through the join (hits > k, prec past 1e6) nor
    // double-count rels
    val ranked = Seq(
      ("s", 1L, 1, 10L), ("s", 1L, 2, 11L), ("s", 1L, 3, 12L),
    ).toDF("system", "query_id", "rank", "neighbor_id")
    val qrels = Seq((1L, 11L), (1L, 12L), (1L, 99L)).toDF("query_id", "doc_id")
    val doubled = qrels.unionByName(qrels).unionByName(qrels.limit(1))
    val clean = Eval.rankedEval(ranked, qrels, k = 3).head()
    val dup = Eval.rankedEval(ranked, doubled, k = 3).head()
    Seq("hits", "rels", "first_hit", "prec_q", "mrr_q", "ndcg_q").foreach { c =>
      dup.getAs[Long](c) shouldBe clean.getAs[Long](c)
    }
  }

  test("R > k caps the ideal at the k-prefix (NDCG can still reach 1.0)") {
    val ranked = Seq(("s", 1L, 1, 11L), ("s", 1L, 2, 12L))
      .toDF("system", "query_id", "rank", "neighbor_id")
    val qrels = Seq((1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L))
      .toDF("query_id", "doc_id")
    Eval.rankedEval(ranked, qrels, k = 2).head()
      .getAs[Long]("ndcg_q") shouldBe 1000000L
  }

  private def aucOf(rows: Seq[(String, Long, Boolean)]): Map[String, Row] = {
    val df = rows.toDF("g", "score_q", "pos")
    Eval.groupedAuc(df, "g", "score_q", "pos").collect()
      .map(r => r.getString(0) -> r).toMap
  }

  test("groupedAuc: separation extremes and the all-ties midpoint") {
    val out = aucOf(Seq(
      // g1: perfect separation (every pos above every neg)
      ("g1", 10L, true), ("g1", 9L, true), ("g1", 2L, false), ("g1", 1L, false),
      // g2: perfectly reversed
      ("g2", 1L, true), ("g2", 2L, true), ("g2", 9L, false), ("g2", 10L, false),
      // g3: one shared score — pure ties
      ("g3", 5L, true), ("g3", 5L, true), ("g3", 5L, false),
    ))
    out("g1").getAs[Long]("auc_q") shouldBe 1000000L
    out("g2").getAs[Long]("auc_q") shouldBe 0L
    out("g3").getAs[Long]("auc_q") shouldBe 500000L
  }

  test("groupedAuc: tie correction is exact (hand-computed case)") {
    // pos scores {3, 2}, neg scores {2, 1}:
    // (3>2)+(3>1)+(2>1)=3 strict, (2=2)=1 tie → AUC = (3 + 0.5)/4 = 0.875
    val out = aucOf(Seq(
      ("g", 3L, true), ("g", 2L, true), ("g", 2L, false), ("g", 1L, false)))
    out("g").getAs[Long]("n_pos") shouldBe 2L
    out("g").getAs[Long]("n_neg") shouldBe 2L
    out("g").getAs[Long]("auc_q") shouldBe 875000L
  }

  test("bootstrapMeanQ: constant metric collapses the interval; draws are deterministic") {
    val df = (1L to 50L).map(i => (i, 7000L)).toDF("id", "m")
    val r = Eval.bootstrapMeanQ(df, "id", "m", b = 32).head()
    r.getAs[Long]("n_rows") shouldBe 50L
    r.getAs[Int]("n_resamples") shouldBe 32
    r.getAs[Long]("point_q") shouldBe 7000L
    r.getAs[Long]("lo_q") shouldBe 7000L
    r.getAs[Long]("hi_q") shouldBe 7000L
    // varying metric: interval ordered, runs reproduce exactly
    val df2 = (1L to 50L).map(i => (i, i * 100L)).toDF("id", "m")
    val a = Eval.bootstrapMeanQ(df2, "id", "m", b = 32).head()
    val b2 = Eval.bootstrapMeanQ(df2, "id", "m", b = 32).head()
    a.getAs[Long]("lo_q") should be <= a.getAs[Long]("hi_q")
    a.getAs[Long]("lo_q") shouldBe b2.getAs[Long]("lo_q")
    a.getAs[Long]("hi_q") shouldBe b2.getAs[Long]("hi_q")
    a.getAs[Long]("point_q") shouldBe (1L to 50L).map(_ * 100L).sum / 50
  }

  test("groupedAuc: a one-class group reports NULL, not a dropped row") {
    val out = aucOf(Seq(
      ("only_pos", 5L, true), ("only_pos", 6L, true),
      ("both", 5L, true), ("both", 4L, false)))
    out.keySet shouldBe Set("only_pos", "both")
    out("only_pos").isNullAt(out("only_pos").fieldIndex("auc_q")) shouldBe true
    out("both").getAs[Long]("auc_q") shouldBe 1000000L
  }
}
