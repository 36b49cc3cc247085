package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed quantile_cont must equal Spark's exact (but group-buffering)
  * `percentile` aggregate on every group and prob, including 1-element
  * groups and ties.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("quantileCont equals the exact percentile aggregate") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 997).map(i =>
      (s"g${i % 5}", math.floor(rnd.nextDouble() * 1000) / 4)) ++
      Seq(("lone", 42.5)) // 1-element group: p = the value itself
    val df = rows.toDF("g", "v")
    val expected = df.groupBy(col("g"))
      .agg(expr("percentile(v, 0.5)").as("p50"),
        expr("percentile(v, 0.95)").as("p95"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    val got = Stats.quantileCont(df, "g", "v", Seq("p50" -> 0.5, "p95" -> 0.95))
      .collect().map(r => (r.getString(0), (r.getDouble(2), r.getDouble(3), r.getLong(1))))
      .toMap
    got.keySet shouldBe expected.keySet
    for ((g, (p50, p95, n)) <- expected) {
      val (q50, q95, m) = got(g)
      m shouldBe n
      q50 shouldBe p50 +- 1e-9
      q95 shouldBe p95 +- 1e-9
    }
  }

  test("boundary probs hit min/max; nulls excluded; n counts non-null") {
    val df = Seq(("a", Some(5.0)), ("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("b", Some(7.0))).toDF("g", "v")
    val out = Stats.quantileCont(df, "g", "v", Seq("p0" -> 0.0, "p100" -> 1.0))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    out("a") shouldBe ((3L, 1.0, 5.0)) // null dropped; min and max exact
    out("b") shouldBe ((1L, 7.0, 7.0)) // singleton group: both ends equal
  }

  test("NULL group key is a legitimate group; all-null groups keep their row") {
    val df = Seq((Option.empty[String], Some(5.0)), (None, Some(1.0)),
      (Some("b"), Some(7.0)), (Some("c"), Option.empty[Double])).toDF("g", "v")
    val rows = Stats.quantileCont(df, "g", "v", Seq("p50" -> 0.5))
      .collect().map(r => (Option(r.getString(0)),
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    rows(None) shouldBe ((2L, Some(3.0)))    // null key group computed, not zeroed
    rows(Some("b")) shouldBe ((1L, Some(7.0)))
    rows(Some("c")) shouldBe ((0L, None))    // all-null group keeps its row
  }
}
