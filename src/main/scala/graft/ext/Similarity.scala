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
        cosine(col("__qv"), col("__cv")).as("__cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("__cos"), 4).as("cosine"))
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
        cosine(col("__qv"), col("__cv")).as("__cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("__cos"), 4).as("cosine"))
  }
}
