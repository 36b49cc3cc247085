package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner for the driver's entry() check (rows>0 on sf0.001). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(5, truncate = false)
    println(s"entry rows = ${df.count()}")
    spark.stop()
  }
}
