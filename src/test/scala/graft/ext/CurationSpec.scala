package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The composed pretraining funnel: stage semantics over a corpus with
  * planted work for every stage, and the SINGLE-EXECUTION contract —
  * the whole point of the composition layer — asserted with a
  * row-counting accumulator on the corpus scan.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic corpus: 40 English docs long enough to pass
  // the quality gate, each ~60 tokens (so the LR teacher sees both
  // classes), spread over 4 sources; planted: an exact copy of doc 2,
  // a near-variant of doc 3, and a contaminated doc sharing 13 tokens
  // with the eval doc
  private def baseText(i: Int): String = {
    // all-letter filler (the alpha-ratio gate must pass), unique per
    // (doc, position) so distinct docs share ONLY the 12-token prefix —
    // shorter than the 13-gram contamination window — and vary in
    // length so the LR teacher (>= 55 tokens) sees both classes
    def enc(v: Int) = "" + ('a' + v % 26).toChar + ('a' + (v / 26) % 26).toChar
    val filler = (1 to (30 + i % 20))
      .map(j => "w" + enc(i) + enc(j)).mkString(" ")
    s"the quick brown fox and it is that for a of to $filler"
  }
  private def corpus = {
    val base = (0 until 40).map(i => (i.toLong, s"src${i % 4}", baseText(i)))
    // planted on LONG docs (18, 19, 17) so the quality calibrator's
    // bottom-20% cut cannot swallow the canonicals this test watches
    (base :+
      ((100L, "src0", baseText(18))) :+                 // exact copy of 18
      ((101L, "src1", baseText(19) + " zz")) :+         // near-variant of 19
      ((102L, "src2", baseText(17)))                    // copy of eval doc 17
    ).toDF("doc_id", "source", "text")
  }
  private def cfg = Curation.PretrainConfig(
    clean = CorpusClean.Config(minTokens = 20, minAlphaRatio = 0.5,
      languages = Set("en")),
    minEstJaccard = 0.5, keepFraction = 0.8, mixTargetFraction = 1.0,
    seqLen = 32, lrIters = 2)

  private def run(c: org.apache.spark.sql.DataFrame) = {
    val docs = corpus.filter($"doc_id" < 40)
    Curation.pretrain(c, "doc_id", "text", "source",
      evalDocs = docs.filter($"doc_id" === 17), "text",
      lrTrain = docs,
      features = Seq(
        (org.apache.spark.sql.functions.length($"text").cast("double") /
          lit(100.0) - lit(1.0)),
        (org.apache.spark.sql.functions.size(TextAnalysis.tokens($"text"))
          .cast("double") / lit(50.0) - lit(1.0))),
      teacher = when(org.apache.spark.sql.functions.size(
          TextAnalysis.tokens($"text")) >= 55, lit(1.0))
        .otherwise(lit(0.0)),
      cfg)
  }

  test("every stage does its job: copies, variants, contamination all resolved") {
    val res = run(corpus)
    val admitted = res.admitted.select($"doc_id").as[Long].collect().toSet
    // exact copy (clean's dedup keeps the min id) and near-variant
    // (minhash resolve keeps the canonical) are gone, canonicals kept
    admitted should contain allOf (18L, 19L)
    admitted should contain noneOf (100L, 101L)
    // the contaminated copy of the eval doc is gone — and so is the
    // eval doc itself (it shares its own 13-grams)
    admitted should contain noneOf (17L, 102L)
    // packing covers each admitted doc's tokens exactly: per doc the
    // emitted [doc_from, doc_to) slices tile [0, n)
    val spans = res.packed.groupBy($"doc_id")
      .agg(min($"doc_from").as("lo"), max($"doc_to").as("hi"),
        sum($"doc_to" - $"doc_from").as("covered"))
    val toks = res.admitted
      .select($"doc_id", org.apache.spark.sql.functions.size(
        TextAnalysis.tokens($"text")).cast("long").as("n"))
    val bad = spans.join(toks, "doc_id")
      .filter($"lo" =!= 0L || $"hi" =!= $"n" || $"covered" =!= $"n")
    bad.count() shouldBe 0L
  }

  test("single-execution composition: no stage after clean re-reads the corpus") {
    // a row-counting UDF on the text column ticks once per corpus row
    // per SCAN — the accumulator is the scan odometer
    val acc = spark.sparkContext.longAccumulator("corpus_scans")
    val tick = udf((s: String) => { acc.add(1L); s })
    val ticked = corpus.withColumn("text", tick($"text"))

    // baseline: stage 1 alone (clean + its checkpoint) costs some fixed
    // number of corpus passes — whatever its internal plan shape needs
    acc.reset()
    CorpusClean.clean(ticked, "doc_id", "text", cfg.clean)
      .localCheckpoint(eager = true)
    val stage1Cost = acc.value

    // the FULL pipeline must cost exactly the same corpus passes: every
    // later stage (near-dup resolve with its component iterations, the
    // calibrator's count/threshold/head actions, the mix's stratum
    // collect, the packer's prefix-sum totals) reads checkpoint
    // barriers, never the corpus
    acc.reset()
    val res = run(ticked)
    acc.value shouldBe stage1Cost

    // and CONSUMING the results re-reads nothing either — both views
    // are checkpoint-backed
    res.admitted.collect()
    res.packed.collect()
    acc.value shouldBe stage1Cost
  }
}
