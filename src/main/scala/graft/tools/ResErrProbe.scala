package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{AnnIndex, Similarity}

/** Diagnostic for the x_knn_ivfpq_residual_err band: rebuild the staged
  * ANN fixture FROM SCRATCH at the current parallelism and print the
  * residual vs raw ADC error moments. Run under several `local[N]` /
  * shuffle-partition settings to measure how much the band moves with
  * partition layout (the round-9 driver-env gate failure).
  *
  * Usage: ResErrProbe <sfDir> [cpus]
  */
object ResErrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = if (args.length > 1) args(1) else "8"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tmp = s"/tmp/graft_reserr_probe_$cpus"
    val t = new java.io.File(tmp)
    if (t.exists()) org.apache.commons.io.FileUtils.deleteDirectory(t)
    val emb = Tables.embeddings(spark, sfDir)
    AnnIndex.buildIvfPq(emb, "vec_id", "embedding", s"$tmp/ivfpq",
      nlist = 16, m = 8, ksub = 16, iters = 2, keepVectors = true)
    AnnIndex.buildIvfPq(emb, "vec_id", "embedding", s"$tmp/ivfpq_res",
      nlist = 16, m = 8, ksub = 16, iters = 2, byResidual = true)

    val queries = emb.filter(col("vec_id") < 5)
    val q_ = queries.select(col("vec_id").cast("long").as("query_id"),
      col("embedding").as("__qv"))
    val exact = emb.select(col("vec_id").cast("long").as("neighbor_id"),
        col("embedding").as("__cv"))
      .join(broadcast(q_), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("__qv"), col("__cv")).as("__c"))
      .localCheckpoint(eager = true)
    def band(sub: String) =
      AnnIndex.ivfPqTopK(spark, AnnIndex.readIvfPq(spark, s"$tmp/$sub"),
          queries, "vec_id", "embedding", k = Int.MaxValue, nprobe = 16)
        .join(exact, Seq("query_id", "neighbor_id"))
        .agg(avg(abs(col("cosine_pq") - col("__c"))).as("avg"),
          max(abs(col("cosine_pq") - col("__c"))).as("max"))
        .head()
    val r = band("ivfpq_res")
    val w = band("ivfpq")
    println(f"PROBE cpus=$cpus%s sf=$sfDir%s res_avg=${r.getDouble(0)}%.6f res_max=${r.getDouble(1)}%.6f raw_avg=${w.getDouble(0)}%.6f raw_max=${w.getDouble(1)}%.6f")
    spark.stop()
  }
}
