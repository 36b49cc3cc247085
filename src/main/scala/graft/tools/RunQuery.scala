package graft.tools

import org.apache.spark.sql.SparkSession

/** Run named SparkEntry queries and print their results — the quick
  * check-one-gate loop while iterating (the full drive is
  * [[graft.Verify]]). Args: [sfDir] queryName...
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RunQuery <sfDir> <queryName>...")
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { n =>
      println(s"\n========== $n ==========")
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir).show(50, truncate = false)
      println(f"[${(System.nanoTime() - t0) / 1e9}%.2f s]")
    }
    spark.stop()
  }
}
