package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 against hand-computed scores (N=3, avg len 3, k1=1.2, b=0.75):
  *
  *   idf(apple)  = ln((3-1+0.5)/(1+0.5) + 1) = ln(8/3)  ≈ 0.9808293
  *   idf(cherry) = ln((3-2+0.5)/(2+0.5) + 1) = ln(1.6)  ≈ 0.4700036
  *   d1 "apple banana apple": tf(apple)=2, len 3 →
  *       0.9808293 · 2·2.2 / (2 + 1.2·(0.25+0.75·3/3)) = 0.9808293·1.375 ≈ 1.3486
  *   d2 "banana cherry": tf(cherry)=1, len 2 →
  *       0.4700036 · 2.2 / (1 + 1.2·(0.25+0.75·2/3)) = 0.4700036·(2.2/1.9) ≈ 0.5442
  *   d3 "cherry cherry cherry cherry": tf=4, len 4 →
  *       0.4700036 · 8.8 / (4 + 1.2·(0.25+0.75·4/3)) = 0.4700036·1.6 ≈ 0.7520
  */
class TextSearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry cherry"),
  ).toDF("doc_id", "text")

  test("bm25Scores matches hand-computed tf/idf/length arithmetic") {
    val q = Seq((0L, "apple cherry")).toDF("qid", "qtext")
    val got = TextSearch.bm25Scores(docs, "doc_id", "text", q, "qid", "qtext")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    got.keySet shouldBe Set(1L, 2L, 3L)
    got(1L) shouldBe (1.3486 +- 0.0001)
    got(2L) shouldBe (0.5442 +- 0.0001)
    got(3L) shouldBe (0.7520 +- 0.0001)
  }

  test("bm25TopK ranks by score desc with doc-id ties; query terms are a set") {
    // duplicated query term must not double-count (query treated as set)
    val q = Seq((0L, "apple cherry cherry")).toDF("qid", "qtext")
    val top = TextSearch.bm25TopK(docs, "doc_id", "text", q, "qid", "qtext", k = 2)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    top.toSeq shouldBe Seq((1, 1L), (2, 3L))
  }

  test("rrfFuse: sums 1/(k0+rank) across rankers, caps at k, ties by doc id") {
    val a = Seq((0L, 10L, 1), (0L, 20L, 2), (0L, 30L, 3)).toDF("query_id", "doc_id", "rank")
    val b = Seq((0L, 20L, 1), (0L, 40L, 2)).toDF("query_id", "doc_id", "rank")
    val fused = TextSearch.rrfFuse(Seq(a, b), k = 3, k0 = 60)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    // doc 20: 1/62 + 1/61 ≈ 0.032523 — in both rankers, wins
    // doc 10: 1/61 ≈ 0.016393; doc 40: 1/62 ≈ 0.016129; doc 30 cut at k=3
    fused.map(t => (t._1, t._2)).toSeq shouldBe Seq((1, 20L), (2, 10L), (3, 40L))
    fused(0)._3 shouldBe (1.0 / 62 + 1.0 / 61 +- 1e-6)
    fused(1)._3 shouldBe (1.0 / 61 +- 1e-6)
  }

  test("terms absent from the corpus and empty queries yield no noise") {
    val q = Seq((0L, "durian mangosteen"), (1L, ""), (2L, "banana")).toDF("qid", "qtext")
    val got = TextSearch.bm25Scores(docs, "doc_id", "text", q, "qid", "qtext")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // only query 2 matches anything; unknown-term and empty queries vanish
    got.map(_._1).distinct.toSeq shouldBe Seq(2L)
    got.map(_._2).sorted.toSeq shouldBe Seq(1L, 2L)
  }
}
