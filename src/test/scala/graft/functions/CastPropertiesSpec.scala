package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-style checks: generated inputs, a Scala-side model of the
  * reference semantics as oracle, one Spark job per property.
  */
class CastPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val seed = org.scalacheck.rng.Seed(42L)
  private def sample[A](g: Gen[List[A]]): List[A] =
    g.pureApply(Gen.Parameters.default, seed)

  test("castBool matches the reference's 6-form table on arbitrary strings") {
    val forms = List("true", "false", "1", "0", "yes", "no", "YES", "No", " TRUE ")
    val junk = sample(Gen.listOfN(120, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)), Gen.oneOf("maybe", "2", "-1", "truthy", ""))))
    val inputs = forms ++ junk
    def model(s: String): Option[Boolean] = {
      val v = s.trim.toLowerCase
      if (Set("true", "1", "yes")(v)) Some(true)
      else if (Set("false", "0", "no")(v)) Some(false)
      else None
    }
    val got = inputs.toDF("s").select(Casts.castBool($"s").as("b")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0)))
    got.toSeq shouldBe inputs.map(model)
  }

  test("splitTrim drops empties and trims every element") {
    val tokens = sample(Gen.listOfN(60,
      Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString.take(6))))
    val raws = tokens.grouped(3).map(g => s" ${g.mkString(" , ")}, ,").toList
    def model(s: String): Seq[String] =
      s.split(",", -1).map(_.trim).filter(_.nonEmpty).toSeq
    val got = raws.toDF("s").select(Casts.splitTrim($"s").as("t")).collect()
      .map(r => r.getSeq[String](0))
    got.toSeq shouldBe raws.map(model)
  }

  test("rolling hash is a total function into [0, 2^40)") {
    val texts = sample(Gen.listOfN(80, Gen.listOf(
      Gen.oneOf("alpha", "beta", "gamma", "Δ", "", "x y")).map(_.mkString(" "))))
    val got = texts.toDF("s")
      .select(graft.ext.TextAnalysis.rollingHash($"s").as("h")).collect()
      .map(_.getLong(0))
    all(got) should (be >= 0L and be < (1L << 40))
    // determinism: same input ⇒ same hash
    val again = texts.toDF("s")
      .select(graft.ext.TextAnalysis.rollingHash($"s").as("h")).collect().map(_.getLong(0))
    got.toSeq shouldBe again.toSeq
  }

  test("langId is total over arbitrary text and correct on pure-stopword docs") {
    val langDocs = graft.ext.TextAnalysis.stopwords.toSeq.map { case (code, ws) =>
      (ws.mkString(" "), code)
    }
    val junk = sample(Gen.listOfN(40, Gen.alphaNumStr.map(_.take(20))))
    val all0 = langDocs.map(_._1) ++ junk
    val got = all0.toDF("s").select(graft.ext.TextAnalysis.langId($"s").as("l"))
      .collect().map(_.getString(0))
    got.take(langDocs.size).toSeq shouldBe langDocs.map(_._2)
    val legal = Set("de", "en", "es", "fr", "und")
    all(got.toSeq) should (be("de") or be("en") or be("es") or be("fr") or be("und"))
    assert(got.forall(legal))
  }
}
