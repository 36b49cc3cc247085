package graft.plans

import graft.SparkSpec
import graft.ext.TextAnalysis
import org.apache.spark.sql.functions._

/** Parity of the native one-pass expressions against their declarative
  * equivalents — the optimization must be invisible to every consumer.
  */
class NativeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "a b"),                        // fewer tokens than n ⇒ empty
    (4L, "x y z x y z x y z"),          // repeated shingles ⇒ dedup
    (5L, ""),                           // empty text
  ).toDF("id", "text")

  test("ShingleHashes equals xxhash64 over the declarative shingles, order included") {
    val native = docs.select($"id",
      TextAnalysis.shingleHashes($"text", 3).as("h")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val declarative = docs.select($"id",
      transform(TextAnalysis.shingles($"text", 3), s => xxhash64(s)).as("h")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    native shouldBe declarative
    native(3) shouldBe empty
    native(4).size shouldBe 3 // 'x y z', 'y z x', 'z x y' — deduped
  }

  test("MinHashAgg: identical docs identical sigs; near docs mostly agree; merge = elementwise min") {
    val sigExpr = org.apache.spark.sql.GraftSqlBridge.column(
      MinHashAgg(org.apache.spark.sql.GraftSqlBridge.expression(col("__h")), 64)
        .toAggregateExpression())
    val sh = docs.filter($"id" <= 2).select($"id",
      explode(TextAnalysis.shingleHashes($"text", 3)).as("__h"))
    val sigs = sh.groupBy($"id").agg(sigExpr.as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    sigs(1).size shouldBe 64
    // doc 1 and 2 share 6 of 8 shingles — most minima must agree
    val agree = sigs(1).zip(sigs(2)).count { case (a, b) => a == b }
    agree should be >= 40
    agree should be < 64

    // repartitioned input forces partial-buffer MERGES; result must not change
    val sigsMerged = sh.repartition(7).groupBy($"id").agg(sigExpr.as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    sigsMerged shouldBe sigs
  }

  test("KMinSetAgg equals the declarative distinct + window k-cut; merges are order-free") {
    import org.apache.spark.sql.expressions.Window
    val k = 16
    // near-unique hashes with planted duplicates across partitions
    val rows = (1 to 5000).map(i => (s"g${i % 3}", ((i * 2654435761L) % 1200)))
    val df = rows.toDF("g", "h")
    val aggExpr = org.apache.spark.sql.GraftSqlBridge.column(
      KMinSetAgg(org.apache.spark.sql.GraftSqlBridge.expression(col("h")), k)
        .toAggregateExpression())
    val native = df.groupBy($"g").agg(aggExpr.as("ks")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val w = Window.partitionBy($"g").orderBy($"h")
    val declarative = df.distinct()
      .withColumn("rn", row_number().over(w)).filter($"rn" <= k)
      .groupBy($"g").agg(sort_array(collect_list($"h")).as("ks")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    native shouldBe declarative
    native.values.foreach { ks =>
      ks.size shouldBe k
      ks shouldBe ks.sorted          // ascending
      ks.toSet.size shouldBe ks.size // distinct
    }
    // repartitioned input forces partial-buffer MERGES; result must not change
    df.repartition(11).groupBy($"g").agg(aggExpr.as("ks")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap shouldBe native
    // under-full group: fewer distinct values than k degenerates to the
    // exact sorted distinct set
    val small = Seq(("a", 5L), ("a", 3L), ("a", 5L), ("a", 9L)).toDF("g", "h")
    small.groupBy($"g").agg(aggExpr.as("ks")).head().getSeq[Long](1) shouldBe
      Seq(3L, 5L, 9L)
  }

  test("KMinSetAgg rejects a non-long child at analysis time, not executor time") {
    // r20 ADVICE: the public SQL surface (kmin_set) could previously be
    // applied to an int/string column and fail mid-task with a
    // ClassCastException; the input check must fire during analysis
    val df = Seq(("a", 1), ("a", 2)).toDF("g", "h") // h is INT
    val aggExpr = org.apache.spark.sql.GraftSqlBridge.column(
      KMinSetAgg(org.apache.spark.sql.GraftSqlBridge.expression(col("h")), 4)
        .toAggregateExpression())
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy($"g").agg(aggExpr.as("ks")).collect()
    }
    e.getMessage should include("BIGINT")
    // an explicitly cast (long) child still analyzes and runs
    val ok = org.apache.spark.sql.GraftSqlBridge.column(
      KMinSetAgg(org.apache.spark.sql.GraftSqlBridge.expression(
        col("h").cast("long")), 4).toAggregateExpression())
    df.groupBy($"g").agg(ok.as("ks")).head().getSeq[Long](1) shouldBe Seq(1L, 2L)
  }

  test("SimHashAgg equals the declarative fold-form simhash signature") {
    val native = graft.ext.Dedup.simhashSignatures(docs, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val declarative = docs
      .filter(org.apache.spark.sql.functions.size(TextAnalysis.tokens($"text")) > 0) // agg form emits no row
      .select($"id", graft.ext.Dedup.simhash($"text").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    native shouldBe declarative
    native.keySet should not contain 5L // empty doc: no tokens, no signature
    // near-identical docs (one token differs) land close in hamming space
    java.lang.Long.bitCount(native(1L) ^ native(2L)) should be <= 16
  }
}
