package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative queries — used to
  * check that joins broadcast, filters push down to the parquet scan, and
  * whole-stage codegen spans stay wide. Args: [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("j1_relation_eqi", "j2_fallback_cascade", "s4_export_populate", "x_dedup_minhash")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
