package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusCleanSpec extends SparkSpec {
  import spark.implicits._

  private val good = ("the quick brown fox jumps over the lazy dog and then " +
    "it runs back home to rest for a while in the sun")

  test("bloom decontamination drops every contaminated doc, keeps the clean ones") {
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val corpus = Seq(
      (1L, good), // clean
      (2L, "prefix words here " + evalText + " suffix words after"), // contains an eval 13-gram
      (3L, good + " more clean trailing content to keep around"), // clean
    ).toDF("doc_id", "text")
    val eval_ = Seq((100L, evalText)).toDF("doc_id", "text")
    val kept = CorpusClean.decontaminateBloom(corpus, "doc_id", "text",
        eval_, "text", n = 13)
      .select("doc_id").as[Long].collect().sorted
    kept shouldBe Array(1L, 3L) // 2 dropped, no false negative
    // subset invariant vs the exact path (Bloom may only over-drop)
    val exact = CorpusClean.decontaminate(corpus, "doc_id", "text",
        eval_, "text", n = 13)
      .select("doc_id").as[Long].collect().toSet
    kept.toSet.subsetOf(exact) shouldBe true
    // empty eval set: nothing drops
    CorpusClean.decontaminateBloom(corpus, "doc_id", "text",
      eval_.filter($"doc_id" < 0), "text", n = 13).count() shouldBe 3
  }

  test("pipeline gates quality, filters language, dedups, drops near-dups") {
    val docs = Seq(
      (1L, good),
      (2L, good), // exact dup of 1 ⇒ dropped
      (3L, good + " extra trailing words here"), // near dup ⇒ dropped when enabled
      (4L, "short text"), // fails minTokens
      (5L, "der hund und die katze ist nicht auf der couch mit dem ball " +
        "und der vogel ist auf dem baum mit der sonne und dem wind heute"), // German ⇒ dropped
      (6L, "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8 zz9 zz10 zz11 zz12 zz13 zz14 " +
        "zz15 zz16 zz17 zz18 zz19 zz20 zz21"), // no stopwords ⇒ lang und ⇒ dropped
    ).toDF("doc_id", "text")

    val basic = CorpusClean.clean(docs, "doc_id", "text",
      CorpusClean.Config(minTokens = 15, minAlphaRatio = 0.5, languages = Set("en")))
      .select("doc_id").as[Long].collect().sorted
    basic shouldBe Array(1L, 3L)

    val withNear = CorpusClean.clean(docs, "doc_id", "text",
      CorpusClean.Config(minTokens = 15, minAlphaRatio = 0.5, languages = Set("en"),
        dropNearDups = true, nearDupJaccard = 0.5))
      .select("doc_id").as[Long].collect().sorted
    withNear shouldBe Array(1L) // 3 is a near dup of 1, higher id dropped
  }

  test("cleanAudit: kept rows are exactly clean()'s output; verdicts name the first failing stage") {
    val docs = Seq(
      (1L, good),
      (2L, good), // exact dup of 1
      (3L, good + " extra trailing words here"), // near dup of 1
      (4L, "short text"), // fails minTokens
      (5L, "der hund und die katze ist nicht auf der couch mit dem ball " +
        "und der vogel ist auf dem baum mit der sonne und dem wind heute"), // German
    ).toDF("doc_id", "text")
    val cfg = CorpusClean.Config(minTokens = 15, minAlphaRatio = 0.5,
      languages = Set("en"), dropNearDups = true, nearDupJaccard = 0.5)
    val audit = CorpusClean.cleanAudit(docs, "doc_id", "text", cfg)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict"))
      .toMap
    audit shouldBe Map(1L -> "kept", 2L -> "exact_dup", 3L -> "near_dup",
      4L -> "quality", 5L -> "language")
    // kept == clean() including the near-dup leg
    val kept = audit.filter(_._2 == "kept").keys.toSeq.sorted
    kept shouldBe CorpusClean.clean(docs, "doc_id", "text", cfg)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // stage flags are total booleans evaluated over the reaching population
    val rows = CorpusClean.cleanAudit(docs, "doc_id", "text", cfg)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("quality_ok"), r.getAs[Boolean]("lang_ok"),
         r.getAs[Boolean]("exact_dup"), r.getAs[Boolean]("near_dup"))).toMap
    // doc 4: quality fails AND its two tokens hit no stopword list
    // (lang 'und') — both flags false, verdict names the FIRST stage
    rows(4L) shouldBe ((false, false, false, false))
    rows(2L) shouldBe ((true, true, true, false))
    rows(3L) shouldBe ((true, true, false, true))
  }
}