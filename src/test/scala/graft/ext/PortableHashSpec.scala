package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The portable sketch family's cross-engine contract, pinned from the
  * JVM side: every identity asserted here is exactly what the DuckDB
  * replay oracles (x_dedup_minhash / x_dedup_simhash /
  * x_dedup_embcos_lsh) recompute in SQL.
  */
class PortableHashSpec extends SparkSpec {
  import spark.implicits._

  test("md5Prefix15(String) equals the SQL conv(substring(md5,1,15)) form") {
    val inputs = Seq("", "a", "hello world", "a:0", "hp:7:63", "zzé世")
    val sql = inputs.toDF("s")
      .select(PortableHash.md5Prefix15(col("s")).as("h"))
      .as[Long].collect()
    val jvm = inputs.map(PortableHash.md5Prefix15)
    sql.toSeq shouldBe jvm
    all(jvm) should be >= 0L
    all(jvm) should be < (1L << 60)
  }

  test("affine matches BigInteger arithmetic across the 128-bit range") {
    val P = BigInt(PortableHash.P)
    val cases = for {
      k <- 0 until 8
      h <- Seq(0L, 1L, (1L << 60) - 1, PortableHash.P - 1,
        PortableHash.md5Prefix15("probe:" + k))
    } yield (PortableHash.familyA(k), h, PortableHash.familyB(k))
    cases.foreach { case (a, h, b) =>
      val expect = (BigInt(a) * BigInt(h) + BigInt(b)) mod P
      BigInt(PortableHash.affine(a, h, b)) shouldBe expect
    }
  }

  test("family constants are the md5-derived values the oracle regenerates") {
    // DuckDB: (CAST('0x'||substring(md5('a:0'),1,15) AS UBIGINT)
    //          % 2305843009213693950) + 1  == 85874429287723409
    PortableHash.familyA(0) shouldBe 85874429287723409L
    PortableHash.familyA(1) should not be PortableHash.familyA(0)
    (0 until 64).foreach { k =>
      PortableHash.familyA(k) should be >= 1L
      PortableHash.familyA(k) should be < PortableHash.P
      PortableHash.familyB(k) should be >= 0L
      PortableHash.familyB(k) should be < PortableHash.P
    }
  }

  test("portable shingle hashes equal md5-prefix of the joined shingles") {
    val df = Seq((1L, "The quick brown fox jumps"), (2L, "too short"))
      .toDF("doc_id", "text")
    val native = df.select(col("doc_id"),
        TextAnalysis.shingleHashes(col("text"), 3, portable = true).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    // declarative reference: distinct shingle strings → md5 prefix
    val ref = df.select(col("doc_id"),
        transform(TextAnalysis.shingles(col("text"), 3),
          s => PortableHash.md5Prefix15(s)).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    native(1L) should contain theSameElementsAs ref(1L)
    native(2L) shouldBe empty
  }

  test("portable minhash signature = per-family min of affine over shingle hashes") {
    val df = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val sig = Dedup.minhashSignatures(df, "doc_id", "text",
        numHashes = 8, shingleSize = 2, portable = true)
      .select(col("__sig")).as[Seq[Long]].head()
    val hashes = df.select(
        TextAnalysis.shingleHashes(col("text"), 2, portable = true))
      .as[Seq[Long]].head()
    val expect = (0 until 8).map(k => hashes.map(h =>
      PortableHash.affine(PortableHash.familyA(k), h, PortableHash.familyB(k))).min)
    sig shouldBe expect
  }

  test("portable simhash blanks bits 60..63 and flags the planted near-dup") {
    val df = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven eight nine zzz"),
      (3L, "totally unrelated content with other words here")).toDF("doc_id", "text")
    val sigs = Dedup.simhashSignatures(df, "doc_id", "text", portable = true)
      .select(col("__sh")).as[Long].collect()
    all(sigs.toSeq) should be >= 0L
    all(sigs.toSeq) should be < (1L << 60)
    val pairs = Dedup.simhashPairs(df, "doc_id", "text",
        maxHamming = 16, portable = true)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect()
    pairs should contain((1L, 2L))
  }

  test("minhashJoin finds cross-corpus near-dups and never pairs within a side") {
    val existing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight again"),
      (2L, "the quick brown fox jumps over the lazy dog tonight again"), // in-side dup of 1
      (3L, "completely unrelated words about distributed query engines")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight again zznew"),
      (11L, "fresh content sharing nothing with the existing corpus today")).toDF("doc_id", "text")
    val pairs = Dedup.minhashJoin(existing, incoming, "doc_id", "text",
        minEstJaccard = 0.3, portable = true)
      .select(col("left_id"), col("right_id")).as[(Long, Long)].collect().toSet
    pairs should contain((1L, 10L))
    pairs should contain((2L, 10L))
    // in-side duplication (1,2) is NOT this operator's output, and the
    // unrelated incoming doc matches nothing
    all(pairs.toSeq.map(_._2)) should be >= 10L
    pairs.map(_._2) should not contain 11L
  }

  test("portable hyperplane bucket groups an exact copy with its original") {
    val v = Array.tabulate(64)(i => (math.sin(i + 1) * 0.3).toFloat)
    val w = Array.tabulate(64)(i => (math.cos(i * 2 + 1) * 0.3).toFloat)
    val df = Seq((1L, v.toSeq), (2L, v.toSeq), (3L, w.toSeq))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    val b = df.select(col("vec_id"),
        Similarity.hyperplaneBucketPortable(col("embedding"), dim = 64).as("b"))
      .as[(Long, Int)].collect().toMap
    b(1L) shouldBe b(2L)
    b(1L) should be >= 0
    b(1L) should be < 256
  }

  test("native portable bucket equals the declarative reference; malformed vectors fail loudly") {
    val rnd = new scala.util.Random(11)
    val df = (0 until 200).map(i =>
        (i.toLong, Array.fill(64)((rnd.nextGaussian() * 0.4).toFloat).toSeq))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    val both = df.select(
        Similarity.hyperplaneBucketPortable(col("embedding"), dim = 64).as("a"),
        Similarity.hyperplaneBucketPortableRef(col("embedding"), dim = 64).as("b"))
      .as[(Int, Int)].collect()
    all(both.toSeq.map(p => p._1 == p._2)) shouldBe true
    both.map(_._1).distinct.length should be > 1 // planes actually split
    val short = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      short.select(Similarity.hyperplaneBucketPortable(col("embedding"), 64))
        .collect()
    }
    e.getMessage should include("64")
  }
}
