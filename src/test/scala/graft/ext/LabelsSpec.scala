package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reliability-weighted majority vote: the reweight must overturn a raw
  * majority exactly when the dissenters are the reliable annotators, and
  * every quantity must be the hand-computable integer.
  */
class LabelsSpec extends SparkSpec {
  import spark.implicits._

  test("the reweight overturns a majority of unreliable annotators") {
    // on items 1-4 annotators a/b form the majority ("good" wins 2:1:1:1
    // — c/d/e scatter across three labels); on item 9 c/d/e converge and
    // outvote a/b 3:2. Reliabilities after round 1: a/b agree on 4 of 5
    // items (800000), c/d/e on 1 of 5 (200000) — so the weighted revote
    // flips item 9 back: 2·800000 > 3·200000.
    val votes = (1L to 4L).flatMap { i =>
      Seq((i, "a", "good"), (i, "b", "good"), (i, "c", "bad1"),
        (i, "d", "bad2"), (i, "e", "bad3"))
    } ++ Seq((9L, "a", "good"), (9L, "b", "good"), (9L, "c", "bad"),
      (9L, "d", "bad"), (9L, "e", "bad"))
    val out = Labels.weightedMajority(votes.toDF("item", "annotator", "label"),
      "item", "annotator", "label")
      .collect().map(r => r.getAs[Long]("item") -> r).toMap
    // items 1-4: majority and weighted majority agree
    (1L to 4L).foreach { i =>
      out(i).getAs[String]("mv_label") shouldBe "good"
      out(i).getAs[String]("wmv_label") shouldBe "good"
      out(i).getAs[Boolean]("flipped") shouldBe false
    }
    // item 9: raw majority is the unreliable trio's "bad"...
    out(9L).getAs[String]("mv_label") shouldBe "bad"
    out(9L).getAs[Long]("mv_votes") shouldBe 3L
    // ...but a/b carry reliability 10⁶ each (5/5 agreement incl. item 9?
    // no: a/b DISAGREE with item 9's majority → 4/5 = 800000 each =
    // 1600000) vs c/d/e at 1/5 = 200000 each = 600000 → flips to "good"
    out(9L).getAs[String]("wmv_label") shouldBe "good"
    out(9L).getAs[Long]("wmv_weight_q") shouldBe 1600000L
    out(9L).getAs[Boolean]("flipped") shouldBe true
  }

  test("majority ties break on the label, both rounds") {
    val votes = Seq((1L, "a", "x"), (1L, "b", "y"))
      .toDF("item", "annotator", "label")
    val r = Labels.weightedMajority(votes, "item", "annotator", "label").head()
    r.getAs[String]("mv_label") shouldBe "x"
    // both annotators grade 1/1 against a tie-broken majority they split
    // on: a agrees (10⁶), b disagrees (0) → weighted revote keeps x
    r.getAs[String]("wmv_label") shouldBe "x"
    r.getAs[Long]("n_votes") shouldBe 2L
  }

  test("the count-compressed form equals the raw log, ties included") {
    // duplicated ballots (an annotator voting the same label repeatedly)
    // exercise the multiplicity algebra; a two-way tie exercises the
    // label tie-break under summed counts
    val votes = Seq(
      (1L, "a", "x"), (1L, "a", "x"), (1L, "b", "y"), (1L, "c", "x"),
      (2L, "a", "y"), (2L, "b", "y"), (2L, "c", "x"), (2L, "c", "x"),
      (3L, "a", "x"), (3L, "b", "y")) // tie on item 3
      .toDF("item", "annotator", "label")
    val fromLog = Labels.weightedMajority(votes, "item", "annotator",
      "label").orderBy("item").collect().toSeq
    val counts = votes.groupBy("item", "annotator", "label")
      .agg(count(lit(1)).as("n"))
    val fromCounts = Labels.weightedMajorityFromCounts(counts, "item",
      "annotator", "label", "n").orderBy("item").collect().toSeq
    fromCounts shouldBe fromLog
  }
test("agreementKappa: perfect, chance-level, and hand-computed mixed logs") {
    import spark.implicits._
    // perfect agreement on 3 items, 2 labels across items -> kappa = 1
    val perfect = Seq((1, "x"), (1, "x"), (2, "y"), (2, "y"), (3, "x"),
      (3, "x")).toDF("item", "label")
    val p = Labels.agreementKappa(perfect, "item", "label").head()
    p.getAs[Long]("po_q") shouldBe 1000000L
    p.getAs[Double]("kappa") shouldBe 1.0
    p.getAs[Long]("po_item_q") shouldBe 1000000L
    p.getAs[Double]("kappa_fleiss") shouldBe 1.0
    // hand-computed mixed log: item 1 = (x,x,y), item 2 = (y,y),
    // item 3 = (x) single ballot (zero pairs both sums)
    // Po = (2*1 + 0 + 2*1 + 0) / (3*2 + 2*1 + 0) = 4/8 -> 500000
    // shares: x=3/6, y=3/6 -> Pe = 1/4 + 1/4 -> 500000
    // kappa = 0 exactly
    val mixed = Seq((1, "x"), (1, "x"), (1, "y"), (2, "y"), (2, "y"),
      (3, "x")).toDF("item", "label")
    val m = Labels.agreementKappa(mixed, "item", "label").head()
    m.getAs[Long]("n_items") shouldBe 3L
    m.getAs[Long]("n_ballots") shouldBe 6L
    m.getAs[Long]("po_q") shouldBe 500000L
    m.getAs[Long]("pe_q") shouldBe 500000L
    m.getAs[Double]("kappa") shouldBe 0.0
    // classical per-item mean: P_1 = 2/6 -> 333333, P_2 = 2/2 ->
    // 1000000, item 3 single ballot excluded; mean of the two floors
    // = 1333333 div 2 = 666666 — the pooled and per-item conventions
    // VISIBLY diverge on this log (500000 vs 666666), which is the
    // point of publishing both
    m.getAs[Long]("po_item_q") shouldBe 666666L
    m.getAs[Double]("kappa_fleiss") shouldBe
      ((666666L - 500000L).toDouble / 500000L)
    // a single-label log saturates chance agreement -> kappa NULL
    val single = Seq((1, "x"), (1, "x"), (2, "x")).toDF("item", "label")
    val s = Labels.agreementKappa(single, "item", "label").head()
    s.getAs[Long]("pe_q") shouldBe 1000000L
    s.isNullAt(s.fieldIndex("kappa")) shouldBe true
    // all-singleton log: Po undefined -> po_q and kappa NULL
    val lonely = Seq((1, "x"), (2, "y")).toDF("item", "label")
    val l = Labels.agreementKappa(lonely, "item", "label").head()
    l.isNullAt(l.fieldIndex("po_q")) shouldBe true
    l.isNullAt(l.fieldIndex("kappa")) shouldBe true
    l.isNullAt(l.fieldIndex("po_item_q")) shouldBe true
    l.isNullAt(l.fieldIndex("kappa_fleiss")) shouldBe true
    // the count-compressed form equals the raw log exactly
    val counts = mixed.groupBy("item", "label").agg(count(lit(1)).as("n"))
    Labels.agreementKappaFromCounts(counts, "item", "label", "n")
      .collect() shouldBe Labels.agreementKappa(mixed, "item", "label").collect()
  }
}
