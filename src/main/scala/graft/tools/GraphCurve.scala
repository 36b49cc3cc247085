package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{AnnIndex, GraphAnn, Similarity}

/** Dev probe for the graph-ANN DECISION RECORD (SURVEY §17): measured
  * recall@5 and serve wall across (beamWidth, hops) operating points of
  * the persisted graph layout, beside the IVF row at its own operating
  * point — the numbers behind build-vs-justify. Usage:
  * runMain graft.tools.GraphCurve <sfDir> [nQueries]
  */
object GraphCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nq = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val idx = graft.queries.ExtensionQueries.stageAnnIndexes(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < nq)
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint(eager = true)
    val brute = Similarity.bruteForceTopK(queries, emb,
        "vec_id", "embedding", 5)
      .localCheckpoint(eager = true)
    def report(name: String)(serve: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val served = serve.localCheckpoint(eager = true)
      val wall = (System.nanoTime() - t0) / 1e9
      val r = AnnIndex.recallReport(Seq(name -> served), brute, 5).head()
      println(f"""{"layout":"$name","recall_at_5":${r.getAs[Double]("recall_at_k")}%.3f,"footrule":${r.getAs[Long]("rank_footrule")},"serve_s":$wall%.2f}""")
    }
    for ((l, h) <- Seq((8, 1), (8, 2), (8, 3), (8, 6), (16, 3), (16, 6),
        (32, 4), (32, 8)))
      report(s"graph_beam${l}_hops$h")(GraphAnn.topK(spark, s"$idx/graph",
        queries, "vec_id", "embedding", 5, beamWidth = l, hops = h))
    // the IVF-built graph (centroid multi-entry): the scalable-build
    // curve beside the exact-build one — same serving code, shallower
    // knee expected from the per-cluster seeds
    for ((l, h) <- Seq((8, 1), (8, 2), (8, 3), (16, 1), (16, 2), (16, 3),
        (16, 6)))
      report(s"graphivf_beam${l}_hops$h")(GraphAnn.topK(spark,
        s"$idx/graphivf", queries, "vec_id", "embedding", 5,
        beamWidth = l, hops = h))
    // the α-pruned wiring (RobustPrune 1.2 over a 3·degree pool): long
    // edges should buy recall-per-hop over the plain IVF-built graph
    for ((l, h) <- Seq((8, 1), (8, 2), (8, 3), (16, 1), (16, 2), (16, 3),
        (16, 6)))
      report(s"graphalpha_beam${l}_hops$h")(GraphAnn.topK(spark,
        s"$idx/graphalpha", queries, "vec_id", "embedding", 5,
        beamWidth = l, hops = h))
    report("ivf_nprobe4")(AnnIndex.ivfTopK(spark,
      AnnIndex.readIvf(spark, s"$idx/ivf"),
      queries, "vec_id", "embedding", 5, nprobe = 4))
    report("ivf_nprobe8")(AnnIndex.ivfTopK(spark,
      AnnIndex.readIvf(spark, s"$idx/ivf"),
      queries, "vec_id", "embedding", 5, nprobe = 8))
    spark.stop()
  }
}
