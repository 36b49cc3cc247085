package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SQL surface of the native expressions: registered functions must be
  * callable from spark.sql and agree with the Column wrappers.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions agree with the Column API") {
    GraftFunctions.register(spark)

    Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f)), (Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("vecs")
    val sql = spark.sql("SELECT round(graft_cosine(a, b), 6) AS c FROM vecs")
      .collect().map(_.getDouble(0)).toSeq
    sql shouldBe Seq(1.0, 0.0)

    Seq("the quick brown fox jumps").toDF("text").createOrReplaceTempView("docs")
    val viaSql = spark.sql(
      "SELECT shingle_hashes(filter(split(lower(trim(text)), '\\\\W+'), t -> t != ''), 3) AS h FROM docs")
      .collect().head.getSeq[Long](0)
    val viaCol = Seq("the quick brown fox jumps").toDF("text")
      .select(graft.ext.TextAnalysis.shingleHashes($"text", 3).as("h"))
      .collect().head.getSeq[Long](0)
    viaSql shouldBe viaCol

    Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("id", "h")
      .createOrReplaceTempView("hashes")
    val sig = spark.sql("SELECT id, minhash_sig(h, 8) AS s FROM hashes GROUP BY id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    sig(1L).size shouldBe 8
    sig(2L).size shouldBe 8
    // group 1's minima are elementwise <= the singleton group over {10,20}∪{30}… sanity only
    all(sig(1L)) should be < Long.MaxValue

    // the session-build-time injection path wires the same definitions
    new GraftExtensions() // constructible; applied via spark.sql.extensions at session build
  }
}
