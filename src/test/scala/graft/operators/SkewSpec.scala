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

  test("asofJoin skew: one all-hot key is a single sort run — correct, bounded, no OOM") {
    // the documented trade (Joins.scala): a hot key lands in ONE window
    // partition = one spilling external sort run. This pins the behavior
    // (correct results, completes) and MEASURES the cost vs the same rows
    // spread over 512 keys, so the escalate-or-not decision has a number.
    val n = 400000
    def run(hot: Boolean): (Long, Double) = {
      val key = if (hot) lit(1L) else (col("id") % 512)
      val left = spark.range(n.toLong).select(
        key.as("k"), (col("id") * 7 % 1000000).as("ts"), col("id").as("eid"))
      val right = spark.range(1000L).select(
        (if (hot) lit(1L) else (col("id") % 512)).as("rk"),
        (col("id") * 997 % 1000000).as("rts"),
        col("id").cast("string").as("payload"))
      val t0 = System.nanoTime()
      val cnt = graft.ext.Joins.asofJoin(left, col("k"), col("ts"),
        right, col("rk"), col("rts"), Seq("payload"),
        rightTiebreak = Seq(col("payload"))).count()
      (cnt, (System.nanoTime() - t0) / 1e9)
    }
    val (hotCnt, hotSec) = run(hot = true)
    val (uniCnt, uniSec) = run(hot = false)
    // asof LEFT join: every left row survives, hot or not
    hotCnt shouldBe n.toLong
    uniCnt shouldBe n.toLong
    info(f"asof skew data point: hot-key $hotSec%.2f s vs uniform $uniSec%.2f s " +
      f"(ratio ${hotSec / uniSec}%.1fx) at n=$n")
    // the data point is reported, not asserted: a wall-clock ratio bound
    // flakes on loaded runners, and the correctness assertions above are
    // what pin the behavior (one sort run completes with every left row)
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
