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

  /** The planted topology RobustPrune exists for (r17 VERDICT item 6):
    * `stacks` ray directions in `dim` dims, each a near-collinear STACK
    * of `perStack` points at graded radii with deterministic md5 jitter.
    * Geometry chosen so the effect is mechanically forced: perStack
    * (12) < the 3·degree candidate pool (18), so every node's pool is
    * ~11 same-stack collinear candidates plus a cross-stack tail —
    * plain top-degree wiring spends all 6 slots inside the stack,
    * α = 1.2 collapses the collinear run into a representative or two
    * and promotes the pool's LONG edges; with only 8 entry clusters
    * over 64 stacks, reaching a far stack at small beam×hops needs
    * exactly those edges.
    */
  private def plantedCorpus(spark: SparkSession, dim: Int = 16,
      stacks: Int = 64, perStack: Int = 12): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    def u(seed: String): Double = // deterministic uniform in [0, 1)
      (graft.ext.PortableHash.md5Prefix15(seed) % 1000000L) / 1000000.0
    val rows = for {
      s <- 0 until stacks
      j <- 0 until perStack
    } yield {
      val dir = Array.tabulate(dim)(d => u(s"dir:$s:$d") - 0.5)
      val n = math.sqrt(dir.map(x => x * x).sum)
      val radius = 1.0 + 0.25 * j // graded radii along the ray
      val v = Array.tabulate(dim) { d =>
        val jitter = (u(s"jit:$s:$j:$d") - 0.5) * 0.02
        ((dir(d) / n) * radius + jitter).toFloat
      }
      ((s * perStack + j).toLong, v)
    }
    rows.toDF("vec_id", "embedding")
  }

  /** `runMain graft.tools.GraphCurve planted [degrees]` — the α-vs-plain
    * curve on the planted topology, matched beam/hops, recall@5 against
    * brute. With a comma list of degrees (r18 VERDICT item 8: the α
    * ceiling at degree 6 was pinned to the intra-stack enumeration
    * limit, with "more degree" the standard answer — measure it), each
    * degree builds BOTH wirings and serves the same operating points,
    * so the table answers whether raw degree recovers the same-stack
    * neighbors α spends slots on, and whether α still buys reach on top.
    */
  private def plantedCurve(spark: SparkSession,
      degrees: Seq[Int] = Seq(6)): Unit = {
    val corpus = plantedCorpus(spark).localCheckpoint(true)
    // queries: one member of every fourth stack — nearest neighbors sit
    // in the query's own stack, entries mostly don't
    val queries = corpus.filter(col("vec_id") % (12 * 4) === 5)
      .localCheckpoint(true)
    val brute = Similarity.bruteForceTopK(queries, corpus,
      "vec_id", "embedding", 5).localCheckpoint(true)
    for (deg <- degrees) {
      val plainDir = s"/tmp/graft_curve_planted_plain_d$deg"
      val alphaDir = s"/tmp/graft_curve_planted_alpha_d$deg"
      GraphAnn.buildFromIvf(corpus, "vec_id", "embedding", plainDir,
        degree = deg, nlist = 8, nprobe = 3)
      GraphAnn.buildFromIvf(corpus, "vec_id", "embedding", alphaDir,
        degree = deg, nlist = 8, nprobe = 3, alphaQ = 1200)
      for {
        (l, h) <- Seq((4, 2), (4, 4), (8, 2), (8, 3), (8, 6), (16, 3), (16, 6),
          (16, 12), (32, 8), (32, 16))
        (name, dir) <- Seq("plain" -> plainDir, "alpha" -> alphaDir)
      } {
        val served = GraphAnn.topK(spark, dir, queries, "vec_id", "embedding",
          5, beamWidth = l, hops = h)
        val r = AnnIndex.recallReport(Seq(s"$name" -> served), brute, 5).head()
        println(f"""{"layout":"planted_${name}_d${deg}_beam${l}_hops$h","recall_at_5":${r.getAs[Double]("recall_at_k")}%.3f,"footrule":${r.getAs[Long]("rank_footrule")}}""")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    // parsed lazily: in `planted` mode args(1) is a degree list, not nq
    lazy val nq = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sfDir == "planted") {
      val degrees =
        if (args.length > 1) args(1).split(",").toSeq.map(_.trim.toInt)
        else Seq(6)
      try plantedCurve(spark, degrees) finally spark.stop()
      return
    }
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
