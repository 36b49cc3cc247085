package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the `ANALYZE`-shaped corpus/warehouse audit
  * surface: per-column row counts, null counts, exact distinct counts
  * and value ranges, as ONE distributed pass (Spark plans the
  * multi-column exact `countDistinct` through a single expand +
  * partial-aggregate job — no per-column rescans), then the 1-row
  * aggregate is unpivoted driver-free into the (column, stats) shape
  * reports consume.
  */
object Profile {

  /** Profile numeric columns: (column_name, n_rows, n_null, n_distinct,
    * min_v, max_v, avg_v), values rounded to 4dp. One corpus pass; the
    * exact distinct counts ride Spark's expand operator (cost ∝
    * columns profiled — profile what the audit needs, or swap
    * `approx_count_distinct` in at 100 TB when ±2% is acceptable).
    */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"__n_$c"), count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        round(min(col(c)), 4).as(s"__mn_$c"),
        round(max(col(c)), 4).as(s"__mx_$c"),
        round(avg(col(c)), 4).as(s"__av_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = array(cols.map(c => struct(
      lit(c).as("column_name"), col(s"__n_$c").as("n_rows"),
      (col(s"__n_$c") - col(s"__nn_$c")).as("n_null"),
      col(s"__nd_$c").as("n_distinct"),
      col(s"__mn_$c").cast("double").as("min_v"),
      col(s"__mx_$c").cast("double").as("max_v"),
      col(s"__av_$c").cast("double").as("avg_v"))): _*)
    one.select(explode(stacked).as("__p")).select(col("__p.*"))
  }
}
