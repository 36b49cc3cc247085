package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed two-phase id assignment must equal the single-partition
  * `row_number() OVER (ORDER BY …)` for any total order.
  */
class IdsSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowNumber equals a global row_number for a total order") {
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle((1 to 5000).toList).map(i => (s"k${i % 997}_$i", i.toLong))
    val df = rows.toDF("name", "payload").repartition(13)
    val ours = Ids.globalRowNumber(df, Seq(col("name")), "id")
      .select($"name", $"payload", $"id").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val reference = df
      .withColumn("id", row_number().over(Window.partitionBy(lit(0)).orderBy($"name")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    ours shouldBe reference
    ours.values.toSeq.sorted shouldBe (1L to 5000L)
  }

  test("globalRowNumber on an empty frame adds the column, yields no rows") {
    val df = Seq.empty[(String, Long)].toDF("name", "payload")
    val out = Ids.globalRowNumber(df, Seq(col("name")), "id")
    out.columns should contain("id")
    out.count() shouldBe 0L
  }
}
