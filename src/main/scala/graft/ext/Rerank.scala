package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cols.qcol

/** Greedy diversity selection — the two canonical instances of the
  * "pick the next item maximizing a submodular-ish objective" pattern a
  * retrieval/curation stack needs:
  *
  *   - [[mmrRerank]]: Maximal Marginal Relevance (Carbonell & Goldstein
  *     1998) re-ranking of a per-query ANN shortlist — relevance to the
  *     query traded against redundancy with already-picked results.
  *     Per-query work is shortlist-bounded, so the operator distributes
  *     as "every query independently", whatever kNN backend produced the
  *     shortlist.
  *   - [[kCenterSelect]]: greedy k-center / farthest-point traversal
  *     (Gonzalez 1985) over an embedding corpus — the coreset /
  *     diversity-pruning selection used by data-selection pipelines.
  *     Inherently k sequential rounds; each round is one embarrassingly
  *     parallel scan, so at 100 TB the cost is k passes, not k sorts.
  *
  * Engine portability: both run entirely on the family's quantized-cosine
  * integer grid (`round(cos, 4)·10⁴` as BIGINT — [[Mining]]'s grid), the
  * greedy objectives are small integer linear forms over those grid
  * values, and every argmax tie-breaks on the id — so the selection
  * trajectory AND its scores replay bit-for-bit in a second engine
  * (the x_knn_mmr / x_sample_kcenter gates hash-pin them).
  */
object Rerank {

  /** round(c,4)·10⁴ as an exact BIGINT (multiply-then-round — see
    * [[Mining]] for why rounding the product avoids the rounded-double
    * representation error).
    */
  private def cosQ(c: Column): Column = round(c * 10000, 0).cast("long")

  /** MMR re-rank a kNN shortlist: from each query's top-`shortlist`
    * candidates (the family's (query_id, rank, neighbor_id, cosine)
    * contract — brute, IVF, graph, any backend), greedily select `k`
    * results maximizing
    *
    *   mmr = λ·sim(q, d) − (1−λ)·max_{s ∈ selected} sim(d, s)
    *
    * with λ = `lambdaNum`/`lambdaDen` kept as integers, so
    * mmr_q = lambdaNum·cq(q,d) − (lambdaDen−lambdaNum)·max cq(d,s) is an
    * exact integer (step 1 has no redundancy term: mmr_q = lambdaNum·cq).
    * Ties break on the candidate id ascending.
    *
    * `corpus` supplies candidate vectors for the pairwise redundancy
    * sims. Scale shape: the candidate-pair frame is |queries|·L² rows
    * (L = shortlist depth, a constant), built by one broadcast-friendly
    * id join into the corpus — per-query bounded, never corpus².
    * The selection loop is k−1 fixed iterations over counter-sized
    * frames; the shortlist and pair frames are materialized once
    * (localCheckpoint) because each feeds every iteration.
    *
    * Output: (query_id, step ∈ 1..k, doc_id, mmr_q).
    */
  def mmrRerank(
      shortTopK: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      lambdaNum: Int = 7,
      lambdaDen: Int = 10,
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaDen > 0 && lambdaNum >= 0 && lambdaNum <= lambdaDen,
      s"need 0 <= lambdaNum <= lambdaDen, got $lambdaNum/$lambdaDen")
    val vecs = corpus.select(qcol(idCol).cast("long").as("__vid"),
      qcol(vecCol).as("__v"))
    // shortlist/corpus contract: a candidate with no corpus vector has
    // no redundancy sims, so steps >= 2 would drop it through the inner
    // joins while step 1 could still hand it a pure-relevance win —
    // exclude unresolved candidates UP FRONT so every step sees the
    // same candidate set (uniform semantics; a no-op when the shortlist
    // came from ANN over the same corpus, the family contract)
    val short = shortTopK.select(col("query_id"),
      col("neighbor_id").as("doc_id"), cosQ(col("cosine")).as("__cq"))
      .join(vecs.select(col("__vid").as("doc_id")), Seq("doc_id"),
        "left_semi")
      .select(col("query_id"), col("doc_id"), col("__cq"))
      .localCheckpoint(eager = false) // lazy: loop is action-free, one final plan
    // pairwise candidate sims within each query's shortlist: two id joins
    // pull vectors, one self-join per query group builds the L² pairs
    val a = short.select(col("query_id"), col("doc_id").as("__aid"))
      .join(vecs, col("__aid") === col("__vid"))
      .select(col("query_id"), col("__aid"), col("__v").as("__av"))
    val b = short.select(col("query_id"), col("doc_id").as("__bid"))
      .join(vecs, col("__bid") === col("__vid"))
      .select(col("query_id"), col("__bid"), col("__v").as("__bv"))
    val pair = a.join(b, Seq("query_id"))
      .filter(col("__aid") =!= col("__bid"))
      .select(col("query_id"), col("__aid"), col("__bid"),
        cosQ(round(Similarity.cosine(col("__av"), col("__bv")), 4)).as("__pq"))
      .localCheckpoint(eager = false) // lazy: loop is action-free, one final plan
    val rel = lit(lambdaNum.toLong)
    val red = lit((lambdaDen - lambdaNum).toLong)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("mmr_q").desc, col("doc_id"))
    // step 1: pure relevance argmax
    var selected = short
      .withColumn("mmr_q", rel * col("__cq"))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("query_id"), lit(1).as("step"), col("doc_id"), col("mmr_q"))
    for (step <- 2 to k) {
      val rem = short.join(
        selected.select(col("query_id"), col("doc_id")),
        Seq("query_id", "doc_id"), "left_anti")
      val mx = pair.join(
        selected.select(col("query_id"), col("doc_id").as("__bid")),
        Seq("query_id", "__bid"))
        .groupBy(col("query_id"), col("__aid"))
        .agg(max(col("__pq")).as("__maxsel"))
        .withColumnRenamed("__aid", "doc_id")
      val pick = rem.join(mx, Seq("query_id", "doc_id"))
        .select(col("query_id"), col("doc_id"),
          (rel * col("__cq") - red * col("__maxsel")).as("mmr_q"))
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("query_id"), lit(step).as("step"), col("doc_id"),
          col("mmr_q"))
      // selected stays queries·k rows; the LAZY checkpoint still cuts the
      // plan flat (LogicalRDD) and shares blocks across the 3 references
      // per next step — but no blocking driver job per step
      selected = selected.unionByName(pick).localCheckpoint(eager = false)
    }
    selected
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) — the
    * standard hybrid-retrieval combiner: each leg contributes
    * 1/(k0 + rank) per (query, doc), summed across legs; k0 = 60 is the
    * literature constant. On the ×10⁶ integer grid the contribution is
    * `10⁶ // (k0 + rank)` — exact, associative, engine-replayable — so
    * the fused ranking hash-matches (x_search_hybrid_rrf fuses the BM25
    * lexical leg with the embedding ANN leg over the shared id space).
    *
    * Input legs in the family's (query_id, rank, neighbor_id) contract
    * (any backend — BM25, brute, IVF, graph); only ranks are read, so
    * incomparable scores never mix. Scale shape: one union of
    * (queries × k)-bounded frames, one groupBy, one query-keyed window
    * — never corpus-sized.
    *
    * Output: (query_id, rank, doc_id, rrf_q, n_legs), top `k` per query
    * by (rrf_q DESC, doc_id).
    */
  def rrfFuse(legs: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one leg")
    require(k >= 1 && k0 >= 1, s"bad fusion knobs: k=$k k0=$k0")
    val u = legs.map(_.select(col("query_id").cast("long"),
        col("neighbor_id").cast("long").as("doc_id"),
        col("rank").cast("long").as("__r"))
        // a leg violating the top-k contract (duplicate doc within one
        // query) would otherwise double-count its contribution AND
        // inflate n_legs past the true leg count; keep its best rank
        .groupBy(col("query_id"), col("doc_id"))
        .agg(min(col("__r")).as("__r")))
      .reduce(_ unionByName _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_q").desc, col("doc_id"))
    u.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(expr(s"1000000 div (${k0.toLong} + __r)")).as("rrf_q"),
        count(lit(1)).cast("int").as("n_legs"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("rrf_q"), col("n_legs"))
  }

  /** Greedy k-center (farthest-point) selection over an embedding corpus:
    * seed with the minimum id, then k−1 times pick the point FARTHEST
    * from its nearest already-chosen center, distance being quantized
    * cosine distance 10⁴ − cq(p, c). The selected ids plus each pick's
    * selection radius are the coreset and its coverage curve (the radius
    * is non-increasing; where it plateaus tells you the corpus' intrinsic
    * diversity — the data-pruning diagnostic).
    *
    * Distributed shape: the working frame carries (id, vec, running
    * min-dist); each round updates the min-dist against ONE new center
    * (a plan-literal vector — no join, no shuffle), takes the global
    * argmax with a TakeOrdered (never a single-partition window), and
    * re-materializes the slim working frame so round i+1 starts from
    * stored state instead of an i-deep recompute. Driver traffic is
    * exactly k rows (each pick's id + vector) — bounded by construction.
    * Ties break on id ascending; already-chosen centers sit at distance
    * 0 and cannot win while any point is farther.
    *
    * Output: (step ∈ 1..k, center_id, sel_dist_q) — sel_dist_q NULL for
    * the seed (no prior centers to be far from).
    */
  def kCenterSelect(
      points: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = points.sparkSession
    import spark.implicits._
    val pts = points.select(qcol(idCol).cast("long").as("__pid"),
      qcol(vecCol).as("__pv"))
    // the seed: minimum id (deterministic, engine-agnostic)
    val seed = pts.orderBy(col("__pid")).limit(1)
      .select(col("__pid"), col("__pv").cast("array<double>")).collect()(0)
    var centers = List[(Int, Long, Option[Long])]((1, seed.getLong(0), None))
    def vecLit(v: Seq[Double]): Column = array(v.map(lit): _*)
    var work = pts.withColumn("__dist",
      lit(10000L) - cosQ(round(Similarity.cosine(col("__pv"),
        vecLit(seed.getSeq[Double](1))), 4)))
      .localCheckpoint(eager = true)
    for (step <- 2 to k) {
      val top = work.orderBy(col("__dist").desc, col("__pid"))
        .limit(1).select(col("__pid"), col("__dist"),
          col("__pv").cast("array<double>")).collect()(0)
      centers ::= ((step, top.getLong(0), Some(top.getLong(1))))
      if (step < k)
        work = work.withColumn("__dist",
          least(col("__dist"), lit(10000L) - cosQ(round(Similarity.cosine(
            col("__pv"), vecLit(top.getSeq[Double](2))), 4))))
          .localCheckpoint(eager = true)
    }
    centers.reverse.toDF("step", "center_id", "sel_dist_q")
      .select(col("step"), col("center_id"),
        col("sel_dist_q").cast("long").as("sel_dist_q"))
  }

  /** The coreset's coverage report: run [[kCenterSelect]], then assign
    * EVERY point to its nearest center — tie-break (dist, center_id)
    * lexicographic — and report per center its population, worst-case
    * radius and summed distance (the inertia-style diagnostic a
    * diversity-pruning pipeline sizes its strata with).
    *
    * Scale shape: the assignment is ONE narrow pass — the k center
    * vectors are plan literals (k·dim doubles, driver-bounded by
    * construction) and the per-point argmin is a `least` over k
    * (dist, id) structs, so no explode, no per-point window, no n·k
    * shuffle; the only exchange is the final k-row groupBy.
    */
  def kCenterAssign(
      points: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
  ): DataFrame = {
    val sel = kCenterSelect(points, idCol, vecCol, k)
    val pts = points.select(qcol(idCol).cast("long").as("__pid"),
      qcol(vecCol).as("__pv"))
    // k center vectors back from their ids — a k-row collect
    val centers = sel.select(col("center_id"))
      .join(pts, col("center_id") === col("__pid"))
      .select(col("center_id"), col("__pv").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    def vecLit(v: Seq[Double]): Column = array(v.map(lit): _*)
    val best = least(centers.map { case (cid, v) =>
      struct(
        (lit(10000L) - cosQ(round(Similarity.cosine(col("__pv"), vecLit(v)), 4)))
          .as("d"),
        lit(cid).as("c"))
    }: _*)
    pts.select(best.getField("d").as("__d"), best.getField("c").as("__c"))
      .groupBy(col("__c").as("center_id"))
      .agg(count(lit(1)).as("n_points"), max(col("__d")).as("max_dist_q"),
        sum(col("__d")).as("sum_dist_q"))
  }
}
