package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Cols.qcol

/** Approximate-nearest-neighbor search over embedding columns
  * (`array<float>`).
  *
  * Scale design: the query set is broadcast (ANN queries are dimension-
  * sized); the corpus scan stays a single pass. Brute force is the exact
  * baseline — one broadcast nested-loop join, cosine in codegen'd array
  * expressions, top-k per query via window. The IVF variant prunes the scan
  * to `nprobe` of `nlist` centroid partitions — the classic inverted-file
  * ANN layout — with centroids learned by a deterministic Lloyd iteration
  * expressed as Spark aggregations (posexplode → per-dimension mean), no
  * driver-side math.
  */
object Similarity {

  /** Cosine similarity of two equal-length float/double array columns
    * (computed in double) — the native single-pass codegen Expression
    * (graft.plans.CosineSimilarity); `cosineDeclarative` keeps the
    * built-in-functions form for reference/testing.
    */
  def cosine(a: Column, b: Column): Column = graft.plans.CosineSimilarity(a, b)

  def cosineDeclarative(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot / (norm(a) * norm(b))
  }

  def norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** Exact top-k cosine neighbors for each query vector (self-matches by id
    * excluded). Queries are broadcast; ties broken by neighbor id.
    *
    * Output: (query_id, rank, neighbor_id, cosine).
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
  ): DataFrame = {
    val q = queries.select(qcol(idCol).cast("long").as("query_id"), qcol(vecCol).as("__qv"))
    val c = corpus.select(qcol(idCol).cast("long").as("neighbor_id"), qcol(vecCol).as("__cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
    topKPerQuery(scored, "cosine", "neighbor_id", k)
  }

  /** Shared top-k epilogue for every ranked retrieval operator: rank per
    * query by the score ROUNDED to `roundTo` decimals, then the id —
    * last-ulp float differences (summation order, engine libm) collapse
    * into the deterministic id tiebreak, so rankings reproduce across
    * engines and runs. Output: (query_id, rank, idCol, scoreCol).
    */
  private[ext] def topKPerQuery(scored: DataFrame, scoreCol: String,
      idCol: String, k: Int, roundTo: Int = 4): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col(scoreCol), roundTo).desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(idCol),
        round(col(scoreCol), roundTo).as(scoreCol))
  }

  /** Random-hyperplane LSH bucket id (nBits sign bits) — the classic
    * SimHash-for-vectors blocking key: cosine-similar vectors land in the
    * same bucket with probability (1 - θ/π)^nBits. Hyperplanes are
    * plan-time literals from a fixed seed; the sign test reuses the native
    * codegen cosine (sign(cos) = sign(dot)). Use as `blockCol` for
    * Dedup.embeddingCosinePairs on unlabeled corpora.
    */
  def hyperplaneBucket(vec: Column, dim: Int, nBits: Int = 8, seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes = Seq.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
    planes.zipWithIndex.map { case (h, k) =>
      val hCol = array(h.map(x => lit(x)): _*)
      when(cosine(vec, hCol) > 0, lit(1 << k)).otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Element-wise mean of grouped vectors (per-dimension avg via
    * posexplode), used by the Lloyd step. Returns (groupCol, centroid).
    */
  private def meanVectors(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(qcol(vecCol)).as(Seq("__pos", "__x")))
      .groupBy(col(groupCol), col("__pos"))
      .agg(avg(col("__x")).as("__m"))
      .groupBy(col(groupCol))
      .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__m")))),
        e => e("__m")).as("centroid"))

  /** Assign each vector the id of its nearest centroid. Broadcast nested
    * loop + partial-aggregated max-by (no window shuffle of the corpus):
    * the (cosine, -cid, cid) struct max picks highest similarity, smallest
    * cid on ties.
    */
  private def assign(df: DataFrame, cols: (String, String), centroids: DataFrame): DataFrame = {
    val (idCol, vecCol) = cols
    val scored = df.crossJoin(broadcast(centroids))
      .select(qcol(idCol).as("__aid"), qcol(vecCol).as("__av"),
        struct(cosine(qcol(vecCol), col("centroid")).as("s"),
          (lit(0) - col("__cid")).as("tb"), col("__cid").as("cid")).as("__sc"))
    scored.groupBy(col("__aid"))
      .agg(first(col("__av")).as("__av"), max(col("__sc")).as("__m"))
      .select(col("__aid").as(idCol), col("__av").as(vecCol),
        col("__m").getField("cid").as("__cluster"))
  }

  /** Train `nlist` centroids with `iters` Lloyd iterations; deterministic
    * init from the `nlist` lowest ids (TakeOrdered — no global sort).
    * Returns (__cid, centroid).
    */
  def trainCentroids(
      corpus: DataFrame, idCol: String, vecCol: String, nlist: Int, iters: Int = 2,
  ): DataFrame = {
    val init = corpus.orderBy(qcol(idCol)).limit(nlist)
    // nlist rows only — the constant partition key states the intent
    // (bounded single-partition numbering) instead of tripping the
    // "no partition defined" scale warning on every run
    val w0 = Window.partitionBy(lit(0)).orderBy(qcol(idCol))
    var centroids = init
      .withColumn("__rn", row_number().over(w0))
      .select((col("__rn") - 1).as("__cid"), qcol(vecCol).as("centroid"))
    var i = 0
    while (i < iters) {
      val assigned = assign(corpus, (idCol, vecCol), centroids)
      centroids = meanVectors(assigned, "__cluster", vecCol)
        .withColumnRenamed("__cluster", "__cid")
      i += 1
    }
    // nlist rows, consumed by BOTH the corpus assignment and the probe
    // selection (and by every Lloyd iteration's lazy chain): localCheckpoint
    // materializes the training ONCE and cuts its lineage — consumers read
    // nlist stored rows, no cacheManager entry to leak across queries
    // (blocks are GC-released with the frame)
    centroids.localCheckpoint(eager = true)
  }

  /** Per-group per-dimension embedding mean in flat (group, dim, mean)
    * shape — the curation-side aggregate (per-label/cluster centroids for
    * drift checks, cluster-based filtering, label prototypes). One
    * explode + one hash aggregate: partial aggregation map-side, shuffle
    * carries (group, dim) partials only — never vectors.
    */
  def groupCentroidsFlat(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(qcol(groupCol).as("label"), posexplode(qcol(vecCol)).as(Seq("dim", "__x")))
      .groupBy(col("label"), col("dim"))
      .agg(avg(col("__x")).as("mean"))

  // --------------------------------------------- product quantization
  /** Product-quantization ANN — the memory-bounded third leg beside brute
    * force and IVF. Vectors are L2-normalized, split into `m` subvectors,
    * and each subvector quantized to one of `ksub` per-subspace centroids
    * (independent Lloyd k-means per subspace, all m subspaces trained in
    * ONE set of Spark aggregations). A corpus vector is then `m` small
    * codes instead of `dim` floats — at 100 TB the codes table is the
    * only thing the query path scans (m bytes-ish per vector vs 4·dim).
    *
    * Query scoring is asymmetric distance computation: since the corpus
    * is normalized, cosine(q, x) = Σⱼ dot(q̂ⱼ, x̂ⱼ) ≈ Σⱼ dot(q̂ⱼ,
    * centroid[j, codeⱼ(x)]) — per query a lookup table of m·ksub partial
    * dots (broadcast), and the corpus-side work is one map-side-combined
    * sum over the codes, no vector arithmetic at all.
    */

  /** Squared L2 distance of two numeric array columns (in double). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
      (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Dot product of two numeric array columns (in double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Explode (id, vec) into m L2-NORMALIZED subvector rows
    * (`__id`, `__j`, `__sv`). The norm is a separate projection column so
    * it is evaluated once per row, not once per element (Spark does not
    * CSE duplicated subtrees inside one projection).
    */
  private def subspaces(df: DataFrame, idCol: String, vecCol: String,
      m: Int, sub: Int): DataFrame =
    df.withColumn("__n", norm(qcol(vecCol)))
      .select(qcol(idCol).cast("long").as("__id"),
        inline(array((0 until m).map(j =>
          struct(lit(j).as("__j"),
            transform(slice(qcol(vecCol), j * sub + 1, sub),
              x => x.cast("double") / col("__n")).as("__sv"))): _*)))

  /** Nearest per-subspace centroid for every subvector row: broadcast
    * m·ksub centroids, min-(distance, cid) struct via partial-aggregated
    * min — no window, ties to the smallest cid.
    */
  private def assignPq(sv: DataFrame, centroids: DataFrame): DataFrame =
    sv.join(broadcast(centroids), Seq("__j"))
      .select(col("__id"), col("__j"), col("__sv"),
        struct(l2sq(col("__sv"), col("centroid")).as("d"), col("__cid").as("cid")).as("__sc"))
      .groupBy(col("__id"), col("__j"))
      .agg(first(col("__sv")).as("__sv"), min(col("__sc")).as("__m"))
      .select(col("__id"), col("__j"), col("__sv"),
        col("__m").getField("cid").as("__code"))

  /** Train per-subspace codebooks over a prebuilt (checkpointed)
    * subspace frame: deterministic init from the `ksub` lowest ids' own
    * subvectors, then `iters` Lloyd rounds (assign via broadcast
    * min-distance, update via per-(subspace, code, dim) mean — the same
    * aggregation shape as `trainCentroids`, m codebooks at once).
    * Returns (`__j`, `__cid`, `centroid`), localCheckpoint'ed (consumed
    * by encoding AND every query LUT).
    */
  private def pqTrainSv(sv: DataFrame, ksub: Int, iters: Int): DataFrame = {
    val w0 = Window.partitionBy(col("__j")).orderBy(col("__id"))
    val initIds = sv.select(col("__id")).distinct().orderBy(col("__id")).limit(ksub)
    // silent underfill would make callers (ivfPqTopK) score against a
    // smaller codebook with no signal — fail loudly instead
    require(initIds.count() == ksub,
      s"PQ training needs >= $ksub distinct ids to seed $ksub centroids per subspace")
    var centroids = sv.join(broadcast(initIds), Seq("__id"))
      .withColumn("__rn", row_number().over(w0))
      .select(col("__j"), (col("__rn") - 1).as("__cid"), col("__sv").as("centroid"))
    var i = 0
    while (i < iters) {
      centroids = assignPq(sv, centroids)
        .select(col("__j"), col("__code"), posexplode(col("__sv")).as(Seq("__pos", "__x")))
        .groupBy(col("__j"), col("__code"), col("__pos"))
        .agg(avg(col("__x")).as("__mn"))
        .groupBy(col("__j"), col("__code"))
        .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__mn")))),
          e => e("__mn")).as("centroid"))
        .withColumnRenamed("__code", "__cid")
      i += 1
    }
    centroids.localCheckpoint(eager = true)
  }

  /** Standalone codebook training (see `pqTrainSv`); prefer `pqModel`
    * when codes are also needed — it shares ONE subspace pass between
    * training and encoding.
    */
  /** Probe the embedding dimension from the first corpus row, with a
    * clear failure on an empty corpus (a bare .head() would throw an
    * uninformative NoSuchElementException from deep inside the plan).
    */
  private def probeDim(corpus: DataFrame, vecCol: String): Int =
    corpus.select(size(qcol(vecCol))).head(1).headOption
      .getOrElse(throw new IllegalArgumentException(
        s"cannot train a PQ/IVF model on an empty corpus (vector column '$vecCol')"))
      .getInt(0)

  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int = 2): DataFrame = {
    val dim = probeDim(corpus, vecCol)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    pqTrainSv(subspaces(corpus, idCol, vecCol, m, dim / m)
      .localCheckpoint(eager = true), ksub, iters)
  }

  /** Trained PQ state: codebooks + corpus codes + geometry. */
  final case class PqModel(centroids: DataFrame, codes: DataFrame, m: Int, sub: Int)

  /** Build codebooks AND corpus codes with ONE dim probe and ONE
    * normalized-subspace pass over the corpus (checkpointed, shared by
    * every Lloyd round and the final encode) — the full-corpus work of a
    * PQ index build happens exactly once.
    */
  def pqModel(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int = 2): PqModel = {
    val dim = probeDim(corpus, vecCol)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    val sv = subspaces(corpus, idCol, vecCol, m, sub).localCheckpoint(eager = true)
    val centroids = pqTrainSv(sv, ksub, iters)
    val codes = assignPq(sv, centroids).select(col("__id"), col("__j"), col("__code"))
    PqModel(centroids, codes, m, sub)
  }

  /** Encode the corpus against trained codebooks: (`__id`, `__j`,
    * `__code`) — m small integers per vector, the only corpus-side state
    * the query path reads.
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, m: Int, sub: Int): DataFrame =
    assignPq(subspaces(corpus, idCol, vecCol, m, sub), centroids)
      .select(col("__id"), col("__j"), col("__code"))

  /** ADC lookup table for a query set: (query_id, __j, __code, __p)
    * where __p = dot(query subvector j, codebook j's centroid `__code`)
    * — queries × m × ksub rows, always broadcast-sized.
    */
  private def pqLut(queries: DataFrame, idCol: String, vecCol: String,
      model: PqModel): DataFrame =
    subspaces(queries, idCol, vecCol, model.m, model.sub)
      .join(broadcast(model.centroids), Seq("__j"))
      .select(col("__id").as("query_id"), col("__j"), col("__cid").as("__code"),
        dot(col("__sv"), col("centroid")).as("__p"))

  /** All approximate query↔corpus cosines via the ADC lookup table:
    * (query_id, neighbor_id, cosine_pq), self-pairs excluded. The LUT
    * (queries × m × ksub partial dots) is broadcast; corpus-side cost is
    * one equi-join on (subspace, code) + a map-side-combined sum.
    */
  def pqScores(queries: DataFrame, idCol: String, vecCol: String,
      model: PqModel): DataFrame =
    model.codes.join(broadcast(pqLut(queries, idCol, vecCol, model)), Seq("__j", "__code"))
      .filter(col("query_id") =!= col("__id"))
      .groupBy(col("query_id"), col("__id"))
      .agg(sum(col("__p")).as("cosine_pq"))
      .select(col("query_id"), col("__id").as("neighbor_id"), col("cosine_pq"))

  /** PQ top-k: output shape matches bruteForceTopK (approximate results,
    * `cosine_pq` = ADC-approximated cosine).
    */
  def pqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int = 4,
      ksub: Int = 16,
      iters: Int = 2,
  ): DataFrame = {
    val model = pqModel(corpus, idCol, vecCol, m, ksub, iters)
    topKPerQuery(pqScores(queries, idCol, vecCol, model), "cosine_pq", "neighbor_id", k)
  }

  /** IVF × PQ composed (the FAISS IVF-PQ layout with global codebooks,
    * `by_residual=false`): prune the scan to the `nprobe` coarse
    * clusters nearest each query, then score ONLY those docs' PQ codes
    * through the ADC lookup table. At 100 TB the query path reads
    * nprobe/nlist of the corpus and m small codes per vector — the cap
    * of both pruning axes at once. (Here the cluster attach is an
    * id-equi-join; a production layout writes the codes table
    * partitioned by cluster so the probe filter is partition pruning.)
    */
  def ivfPqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 2,
  ): DataFrame = {
    val coarse = trainCentroids(corpus, idCol, vecCol, nlist, iters)
    val clusterOf = assign(corpus, (idCol, vecCol), coarse)
      .select(qcol(idCol).cast("long").as("__id"), col("__cluster"))
    val model = pqModel(corpus, idCol, vecCol, m, ksub, iters)
    val q = queries.select(qcol(idCol).cast("long").as("query_id"), qcol(vecCol).as("__qv"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(cosine(col("__qv"), col("centroid")).desc, col("__cid"))
    val probes = q.crossJoin(broadcast(coarse))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("__cid").as("__cluster"))
    val scored = model.codes
      .join(clusterOf, Seq("__id"))
      .join(broadcast(probes), Seq("__cluster"))
      .filter(col("query_id") =!= col("__id"))
      .join(broadcast(pqLut(queries, idCol, vecCol, model)),
        Seq("query_id", "__j", "__code"))
      .groupBy(col("query_id"), col("__id"))
      .agg(sum(col("__p")).as("cosine_pq"))
      .withColumnRenamed("__id", "neighbor_id")
    topKPerQuery(scored, "cosine_pq", "neighbor_id", k)
  }

  /** IVF top-k: scan only the `nprobe` clusters nearest to each query.
    * Output shape matches bruteForceTopK (approximate results).
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
  ): DataFrame = {
    val centroids = trainCentroids(corpus, idCol, vecCol, nlist)
    val assigned = assign(corpus, (idCol, vecCol), centroids)
      .select(qcol(idCol).cast("long").as("neighbor_id"), qcol(vecCol).as("__cv"),
        col("__cluster"))

    val q = queries.select(qcol(idCol).cast("long").as("query_id"), qcol(vecCol).as("__qv"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(cosine(col("__qv"), col("centroid")).desc, col("__cid"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("__qv"), col("__cid").as("__cluster"))

    val scored = probes.join(assigned, Seq("__cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cosine"))
    topKPerQuery(scored, "cosine", "neighbor_id", k)
  }
}
