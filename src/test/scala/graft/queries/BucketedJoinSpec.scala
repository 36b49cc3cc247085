package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Bucketed co-located join: the join of two tables bucketed+sorted on the
  * join key must read buckets directly — NO shuffle exchange on the join
  * key in the physical plan (the layout prepays the exchange).
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join of bucketed tables is exchange-free; result matches plain join") {
    val dim = (1L to 100L).map(k => (k, s"p$k")).toDF("k", "name")
    val fact = (1L to 1000L).map(i => (i % 100 + 1, i.toDouble)).toDF("k", "v")

    spark.sql("DROP TABLE IF EXISTS spec_dim_b")
    spark.sql("DROP TABLE IF EXISTS spec_fact_b")
    dim.write.mode("overwrite").format("parquet")
      .bucketBy(4, "k").sortBy("k")
      .option("path", "/tmp/graft_bucketed_spec/dim").saveAsTable("spec_dim_b")
    fact.write.mode("overwrite").format("parquet")
      .bucketBy(4, "k").sortBy("k")
      .option("path", "/tmp/graft_bucketed_spec/fact").saveAsTable("spec_fact_b")

    // disable auto-broadcast so the bucket layout (not a broadcast) must
    // carry the join; restore after
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("spec_fact_b")
        .join(spark.table("spec_dim_b"), "k")
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      shuffles shouldBe empty

      val bucketed = joined.groupBy($"name").agg(sum($"v").as("s"))
        .orderBy($"name").collect()
      val plain = fact.join(dim, "k").groupBy($"name").agg(sum($"v").as("s"))
        .orderBy($"name").collect()
      bucketed.toSeq shouldBe plain.toSeq
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
