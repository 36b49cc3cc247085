package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Cols.qcol

/** Graph-based ANN — the eleventh persisted index layout, answering the
  * build-or-justify decision on the HNSW/Vamana family (VERDICT r14 #6)
  * with a BUILD: a single-layer navigable neighbor graph ("NSW-lite" —
  * DiskANN/Vamana's serving shape without the hierarchy) persisted as
  * parquet, served by a fixed-width, fixed-depth BEAM SEARCH of
  * iterative joins.
  *
  * Layout under `dir` (meta carries layout = "graph"):
  *   - `vectors/`   (__id, __vec)            — the corpus vectors;
  *   - `adjacency/` (__id, __nbrs long[])    — each node's `degree`
  *     exact top-cosine neighbors (id-sorted: beam search is
  *     set-semantics, storage order must not matter);
  *   - `entry/`     (entry, degree)          — the search entry point:
  *     the corpus MEDOID (max rounded cosine to the mean vector, min id
  *     tie) — the standard Vamana start.
  *
  * Serving (`topK`) is DETERMINISTIC given the stored graph: beam_0 =
  * {entry}; each hop scores beam ∪ neighbors(beam) per query and keeps
  * the `beamWidth` best by (cosine rounded 4dp DESC, id) — the library's
  * ranking discipline — for `hops` FIXED hops (no early exit: a
  * data-dependent exit would make the served set depend on float
  * convergence tests; fixed depth makes the whole path replayable in a
  * second engine's SQL, which is how the x_knn_graph gate hash-pins it).
  *
  * Scale shape: each hop is one join of the (queries × beamWidth)
  * candidate frame — broadcast side — against the adjacency table, one
  * join against the vectors table, one key-partitioned window. Serve
  * cost is hops × beamWidth × degree vector reads per query,
  * INDEPENDENT of corpus size — the property that makes graph indexes
  * the production high-recall family. The graph tables join by id, so a
  * deployment buckets both by __id and the lookups co-locate.
  *
  * BUILD here is the exact top-`degree` neighbor graph by brute force —
  * deterministic and oracle-able, the right gate-scale choice; at
  * 100 TB the edge lists come from the IVF machinery instead
  * (candidates = ivfTopK of the corpus against itself, then the same
  * persist) — the serving path reads only the LAYOUT and does not care
  * how edges were produced. What this build deliberately omits from
  * full Vamana: the hierarchy (HNSW's upper layers — replaced by the
  * medoid entry) and alpha-pruned long edges (diversity pruning) —
  * the recall-report row measures what that costs at this geometry;
  * SURVEY §17 records the resulting trade against the IVF family.
  */
object GraphAnn {

  def build(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      degree: Int = 8): Unit = {
    require(degree > 0, s"degree must be positive: $degree")
    val spark = corpus.sparkSession
    val c = corpus.select(qcol(idCol).cast("long").as("__id"),
        qcol(vecCol).as("__vec"))
      .localCheckpoint(eager = true) // vectors + edges + medoid share it
    AnnIndex.writeMeta(spark, dir, m = 0, sub = 0, nlist = -1,
      layout = "graph")
    c.write.mode("overwrite").parquet(s"$dir/vectors")
    // exact top-degree neighbors per node (self excluded by the brute
    // top-k contract); stored id-sorted — set semantics
    Similarity.bruteForceTopK(c, c, "__id", "__vec", degree)
      .groupBy(col("query_id").as("__id"))
      .agg(array_sort(collect_set(col("neighbor_id"))).as("__nbrs"))
      .write.mode("overwrite").parquet(s"$dir/adjacency")
    // medoid entry: the row nearest the mean vector. The mean is a
    // DIMENSION-sized driver value (bounded collect), re-broadcast as a
    // literal array — no corpus-sized driver state
    val dim = c.select(size(col("__vec"))).head().getInt(0)
    val meanRow = c.select((0 until dim).map(i =>
      avg(element_at(col("__vec"), i + 1).cast("double")).as(s"_m$i")): _*)
      .head()
    val mean = array((0 until dim).map(i => lit(meanRow.getDouble(i))): _*)
    val entry = c.select(col("__id"),
        Similarity.cosine(col("__vec"), mean).as("__c"))
      .orderBy(round(col("__c"), 4).desc, col("__id")).limit(1)
      .select(col("__id")).head().getLong(0)
    import spark.implicits._
    Seq((entry, degree)).toDF("entry", "degree")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/entry")
  }

  /** Beam-search top-k over a persisted graph index. Output:
    * (query_id, rank, neighbor_id, cosine) — the family contract,
    * self-matches excluded from the FINAL ranking (every serving path
    * in the family does); the beam itself may pass through the query's
    * own node (navigation).
    */
  def topK(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      beamWidth: Int = 8, hops: Int = 3): DataFrame = {
    require(k > 0 && beamWidth >= k,
      s"beamWidth ($beamWidth) must be >= k ($k)")
    require(hops > 0, s"hops must be positive: $hops")
    require(AnnIndex.readLayout(spark, dir) == "graph",
      s"$dir is not a graph index — each layout has its own reader")
    val entry = spark.read.parquet(s"$dir/entry").head().getLong(0)
    val v = spark.read.parquet(s"$dir/vectors")
    val adj = spark.read.parquet(s"$dir/adjacency")
    val q = queries.select(qcol(idCol).cast("long").as("query_id"),
        qcol(vecCol).as("__qv"))
      .localCheckpoint(eager = true) // re-joined every hop
    // BOTH per-hop joins broadcast the beam/candidate side (queries ×
    // beamWidth × degree rows — always tiny) into the corpus-sized
    // stored tables: the vectors and adjacency tables never shuffle,
    // hop cost is pointwise lookups — the property that makes the
    // serve cost corpus-size-independent (plan-asserted)
    def scoreTop(cands: DataFrame, width: Int,
        excludeSelf: Boolean = false): DataFrame = {
      val scored = v.join(broadcast(cands), cands("__nid") === v("__id"))
        .drop("__id")
        .join(broadcast(q), Seq("query_id"))
        .select(col("query_id"), col("__nid"),
          Similarity.cosine(col("__qv"), col("__vec")).as("cosine"))
      Similarity.topKPerQuery(
        if (excludeSelf) scored.filter(col("query_id") =!= col("__nid"))
        else scored,
        "cosine", "__nid", width)
    }
    var beam = q.select(col("query_id"), lit(entry).as("__nid"))
    for (_ <- 1 to hops) {
      val expanded = adj
        .join(broadcast(beam), beam("__nid") === adj("__id"))
        .select(col("query_id"), explode(col("__nbrs")).as("__nid"))
        .unionByName(beam.select(col("query_id"), col("__nid")))
        .distinct()
      // checkpoint per hop: the iterative-join discipline (x_pagerank
      // class) — lineage stays hop-sized, not hops-deep
      beam = scoreTop(expanded, beamWidth)
        .select(col("query_id"), col("__nid"))
        .localCheckpoint(eager = true)
    }
    scoreTop(beam, k, excludeSelf = true)
      .withColumnRenamed("__nid", "neighbor_id")
  }
}
