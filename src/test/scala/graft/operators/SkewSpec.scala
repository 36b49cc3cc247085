package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join (inner and left)") {
    val large = (1 to 500).map(i => (if (i % 10 == 0) "hot" else s"k$i", i)).toDF("k", "v")
    val small = Seq(("hot", 100), ("k3", 3), ("zzz", 9)).toDF("k", "w")
    val plain = large.join(small, Seq("k")).orderBy("k", "v").collect()
    val salted = Skew.saltedJoin(large, small, "k", salt = 8).orderBy("k", "v").collect()
    salted shouldBe plain
    val plainLeft = large.join(small, Seq("k"), "left").orderBy("k", "v").collect()
    val saltedLeft = Skew.saltedJoin(large, small, "k", 8, "left").orderBy("k", "v").collect()
    saltedLeft shouldBe plainLeft
  }

  test("salted aggregation equals plain aggregation") {
    val df = (1 to 1000).map(i => (if (i % 3 == 0) "hot" else s"k${i % 7}", i.toLong)).toDF("k", "v")
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").collect()
    val salted = Skew.saltedAgg(df, "k", 16,
      partial = Seq(count(lit(1)).as("pn"), sum("v").as("ps")),
      combine = Seq(sum("pn").as("n"), sum("ps").as("s")))
      .orderBy("k").collect()
    salted shouldBe plain
  }
}
