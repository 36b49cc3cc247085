package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("unigramSurprisal: hand-computed smoothed log-probs, null for empty docs") {
    // counts: a=2 b=1 c=1, T=4, V=3 → p(a)=3/7, p(b)=p(c)=2/7
    val docs = Seq((1L, "a a b"), (2L, "c"), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    got(1L)._1 shouldBe 3L
    got(1L)._2.get shouldBe ((2 * -math.log(3.0 / 7) - math.log(2.0 / 7)) / 3 +- 1e-9)
    got(2L)._1 shouldBe 1L
    got(2L)._2.get shouldBe (-math.log(2.0 / 7) +- 1e-9)
    got(3L) shouldBe (0L, None)
  }

  test("token and bpeish counts") {
    val df = Seq("Hello, world! It's fine.").toDF("text")
      .select(TextAnalysis.tokenCount($"text").as("t"), TextAnalysis.bpeishCount($"text").as("b"))
    val r = df.collect().head
    r.getAs[Int]("t") shouldBe 5 // hello world it s fine
    r.getAs[Int]("b") shouldBe 9 // 5 words + , ! ' .
  }

  test("shingles: 3-grams, distinct, short docs empty") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(TextAnalysis.shingles($"text", 3).as("g"))
    val rows = df.collect()
    rows(0).getSeq[String](0) shouldBe Seq("a b c", "b c d")
    rows(1).getSeq[String](0) shouldBe Seq.empty
  }

  test("langId picks the stopword-dominant language, und when none") {
    val df = Seq(
      "the cat sat on the mat and it is happy",
      "der hund ist nicht auf der couch und die katze",
      "xyzzy plugh quux",
    ).toDF("text").select(TextAnalysis.langId($"text").as("lang"))
    df.as[String].collect().toSeq shouldBe Seq("en", "de", "und")
  }

  test("withLangId agrees with the column form and keeps zero-token docs") {
    val df = Seq(
      (1L, "the cat and the hat is it"),
      (2L, "der hund und die katze ist da"),
      (3L, ""),
      (4L, "xyzzy plugh"),
    ).toDF("id", "text")
    val viaDf = TextAnalysis.withLangId(df, "id", "text", "lang")
      .orderBy("id").select("lang").as[String].collect().toSeq
    val viaCol = df.orderBy("id")
      .select(TextAnalysis.langId($"text").as("lang")).as[String].collect().toSeq
    viaDf shouldBe viaCol
    viaDf shouldBe Seq("en", "de", "und", "und")
  }

  test("fingerprint is whitespace/case invariant") {
    val df = Seq(("Hello   World", "hello world"), ("a b", "a c"))
      .toDF("x", "y")
      .select((TextAnalysis.fingerprint($"x") === TextAnalysis.fingerprint($"y")).as("eq"))
    df.as[Boolean].collect().toSeq shouldBe Seq(true, false)
  }

  test("rolling hash deterministic and order sensitive") {
    val df = Seq(("a b c", "a b c", "c b a")).toDF("x", "y", "z")
      .select(TextAnalysis.rollingHash($"x").as("hx"),
        TextAnalysis.rollingHash($"y").as("hy"), TextAnalysis.rollingHash($"z").as("hz"))
    val r = df.collect().head
    r.getAs[Long]("hx") shouldBe r.getAs[Long]("hy")
    r.getAs[Long]("hx") should not be r.getAs[Long]("hz")
  }

  test("multimodal text decode: fallback features; text payloads yield no frames") {
    val docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.fromText(docs, "doc_id", "text", "text")
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.id)
    feats(0).byte_len shouldBe 11L
    feats(0).channels shouldBe 1 // no PNG/WAV signature: fallback branch
    val crc = new java.util.zip.CRC32
    crc.update("hello world".getBytes("UTF-8"))
    feats(0).content_hash shouldBe crc.getValue
    feats(1).byte_len shouldBe 0L
    // frame extraction is a REAL GIF decode now: text bytes drop
    Multimodal.gifFrames(media).collect() shouldBe empty
  }

  test("perplexityPrune: per-source rank cut, ties by id, unscorable docs prune first") {
    // source A: four docs with sharply different bigram perplexities
    // (a repeated bigram is cheap, unseen transitions are expensive);
    // source B: two docs, one unscorable (single token)
    val docs = Seq(
      (1L, "A", "x y x y x y x y"),   // all (x,y)/(y,x) bigrams: cheap
      (2L, "A", "x y x y x y q q"),   // mostly cheap
      (3L, "A", "p q r s t u v w"),   // every bigram near-unique
      (4L, "A", "x y x y x y x y"),   // identical to doc 1: tie on ppl
      (5L, "B", "x y x y"),
      (6L, "B", "solo")               // < 2 tokens: NULL ppl, prunes first
    ).toDF("doc_id", "source", "text")
    val got = TextAnalysis.perplexityPrune(docs, "doc_id", "text", "source",
        keepFraction = 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    // A keeps floor(0.5*4) = 2: the tied cheap docs 1 and 4 (tie by id)
    got(1L) shouldBe true
    got(4L) shouldBe true
    got(2L) shouldBe false
    got(3L) shouldBe false
    // B keeps floor(0.5*2) = 1: the scorable doc; the unscorable prunes
    got(5L) shouldBe true
    got(6L) shouldBe false
    // keepFraction 0 keeps nothing; 1.0 keeps everything
    TextAnalysis.perplexityPrune(docs, "doc_id", "text", "source", 0.0)
      .filter(org.apache.spark.sql.functions.col("kept")).count() shouldBe 0L
    TextAnalysis.perplexityPrune(docs, "doc_id", "text", "source", 1.0)
      .filter(!org.apache.spark.sql.functions.col("kept")).count() shouldBe 0L
  }

  test("canonicalUrl applies every rule; non-defaults survive") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val urls = Seq(
      "HTTPS://Example.COM:443/p/1?b=2&utm_source=x&a=1#frag",
      "https://example.com/p/1?a=1&b=2",
      "HTTP://Host.org:80/a",
      "http://host.org:8080/a", // non-default port SURVIVES
      "https://h.io", // empty path -> "/"
      "https://h.io/q?utm_a=1&utm_b=2", // all params tracking -> no "?"
    ).toDF("u")
    val got = urls.select(col("u"),
      TextAnalysis.canonicalUrl(col("u")).as("c")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    got("HTTPS://Example.COM:443/p/1?b=2&utm_source=x&a=1#frag") shouldBe
      "https://example.com/p/1?a=1&b=2"
    got("https://example.com/p/1?a=1&b=2") shouldBe
      "https://example.com/p/1?a=1&b=2"
    got("HTTP://Host.org:80/a") shouldBe "http://host.org/a"
    got("http://host.org:8080/a") shouldBe "http://host.org:8080/a"
    got("https://h.io") shouldBe "https://h.io/"
    got("https://h.io/q?utm_a=1&utm_b=2") shouldBe "https://h.io/q"
  }

  test("charEntropyQ: hand-computed bands, empty text is NULL") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val got = Seq("aaaa", "aabb", "abcd", "").toDF("t")
      .select(col("t"), TextAnalysis.charEntropyQ(col("t")).as("h")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    got("aaaa") shouldBe Some(0.0)
    got("aabb") shouldBe Some(1.0) // two equiprobable symbols = 1 bit/char
    got("abcd") shouldBe Some(2.0)
    got("") shouldBe None
  }
}
