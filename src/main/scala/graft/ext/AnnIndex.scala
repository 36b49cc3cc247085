package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Cols.qcol
import graft.ext.Similarity.{PqModel, pqLut, probeClusters, topKPerQuery}

/** Persisted ANN indexes — the production shape of the PQ / IVF×PQ
  * operators: build ONCE (train codebooks on a bounded sample, encode the
  * full corpus in a single pass, lay the codes out on disk), then query
  * many times against the stored tables. Two layouts:
  *
  *   - PQ index (`writePq`/`readPq`): codebooks + flat codes as parquet.
  *     Query cost is a codes scan + broadcast ADC lookup — no training,
  *     no vector arithmetic.
  *   - IVF×PQ index (`buildIvfPq`/`readIvfPq`): adds coarse centroids and
  *     writes the codes table PARTITIONED BY coarse cluster. The
  *     per-query nprobe filter then becomes parquet PARTITION PRUNING —
  *     only nprobe-ish of nlist directories are ever read, with no
  *     corpus-sized cluster-attach join anywhere on the query path (at
  *     100 TB that id-equi-join would shuffle the whole codes table per
  *     query batch — the exact scan the IVF axis exists to avoid; the
  *     one cluster attach happens at BUILD time instead, once).
  *
  * Directory layout under `dir`:
  * {{{
  *   meta/       one row: m, sub (subvector width), nlist (-1 for flat PQ)
  *   codebooks/  (__j, __cid, centroid)        — m·ksub rows
  *   coarse/     (__cid, centroid)             — nlist rows (IVF×PQ only)
  *   codes/      (__id, __j, __code)           — flat PQ
  *               (__cluster=K/ …)              — IVF×PQ, cluster-partitioned
  * }}}
  */
object AnnIndex {

  /** A loaded IVF×PQ index: coarse centroids + codebooks in hand, codes
    * left ON DISK (`codesPath`) so each query plans its own pruned scan.
    */
  final case class IvfPqIndex(coarse: DataFrame, codebooks: DataFrame,
      codesPath: String, m: Int, sub: Int)

  private def writeMeta(spark: SparkSession, dir: String, m: Int, sub: Int,
      nlist: Int): Unit = {
    import spark.implicits._
    Seq((m, sub, nlist)).toDF("m", "sub", "nlist")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  private def readMeta(spark: SparkSession, dir: String): (Int, Int, Int) = {
    val r = spark.read.parquet(s"$dir/meta").head()
    (r.getAs[Int]("m"), r.getAs[Int]("sub"), r.getAs[Int]("nlist"))
  }

  // ----------------------------------------------------------- flat PQ
  /** Persist a trained PQ model (codebooks + corpus codes) as parquet. */
  def writePq(model: PqModel, dir: String): Unit = {
    val spark = model.centroids.sparkSession
    writeMeta(spark, dir, model.m, model.sub, nlist = -1)
    model.centroids.write.mode("overwrite").parquet(s"$dir/codebooks")
    model.codes.write.mode("overwrite").parquet(s"$dir/codes")
  }

  /** Train + encode + persist in one call (the index-build job). */
  def buildPq(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      m: Int, ksub: Int, iters: Int = 2, maxTrainRows: Int = 0): Unit =
    writePq(Similarity.pqModel(corpus, idCol, vecCol, m, ksub, iters, maxTrainRows), dir)

  /** Load a persisted PQ index as a [[Similarity.PqModel]] — drop-in for
    * `pqScores`/`pqTopK` query paths, with zero training cost.
    */
  def readPq(spark: SparkSession, dir: String): PqModel = {
    val (m, sub, _) = readMeta(spark, dir)
    PqModel(spark.read.parquet(s"$dir/codebooks"),
      spark.read.parquet(s"$dir/codes"), m, sub)
  }

  /** PQ top-k against a persisted index (build once, query many). */
  def pqTopK(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame =
    Similarity.pqTopKWithModel(queries, idCol, vecCol, readPq(spark, dir), k)

  // ----------------------------------------------------------- IVF-flat
  /** A loaded IVF-flat index: coarse centroids in hand, full vectors left
    * ON DISK partitioned by cluster (`vectorsPath`).
    */
  final case class IvfIndex(coarse: DataFrame, vectorsPath: String, nlist: Int)

  /** Build the IVF-flat index: centroids trained on a bounded sample, the
    * full corpus assigned ONCE and written partitioned by cluster. The
    * in-memory [[Similarity.ivfTopK]] re-assigns the corpus per query
    * batch — fine ad hoc, but at 100 TB assignment is a full corpus pass
    * and the cluster join a corpus-sized shuffle; this layout pays both
    * once at build time.
    */
  def buildIvf(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      nlist: Int, iters: Int = 2, maxTrainRows: Int = 0): Unit = {
    val spark = corpus.sparkSession
    val coarse = Similarity.trainCentroids(corpus, idCol, vecCol, nlist, iters,
      maxTrainRows)
    writeMeta(spark, dir, m = 0, sub = 0, nlist)
    coarse.write.mode("overwrite").parquet(s"$dir/coarse")
    Similarity.assign(corpus, (idCol, vecCol), coarse)
      .select(qcol(idCol).cast("long").as("__id"), qcol(vecCol).as("__vec"),
        col("__cluster"))
      .write.partitionBy("__cluster").mode("overwrite").parquet(s"$dir/vectors")
  }

  def readIvf(spark: SparkSession, dir: String): IvfIndex = {
    val (_, _, nlist) = readMeta(spark, dir)
    require(nlist > 0, s"$dir has no coarse quantizer (nlist=$nlist)")
    IvfIndex(spark.read.parquet(s"$dir/coarse"), s"$dir/vectors", nlist)
  }

  /** IVF-flat top-k against the persisted index: nprobe coarse clusters
    * per query (broadcast centroids), the probed-cluster union as a
    * PartitionFilter on the vectors scan, exact codegen cosine on the
    * surviving nprobe/nlist of the corpus. Output shape matches
    * bruteForceTopK.
    */
  def ivfTopK(spark: SparkSession, index: IvfIndex, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val q = queries.select(qcol(idCol).cast("long").as("query_id"),
      qcol(vecCol).as("__qv"))
    val probes = probeClusters(q, index.coarse, nprobe)
      .localCheckpoint(eager = true) // reused by the collect AND the join
    val probed = probes.select(col("__cluster")).distinct()
      .collect().map(_.getInt(0)) // ≤ nlist values by construction
    val vectors = spark.read.parquet(index.vectorsPath)
      .filter(col("__cluster").isin(probed.map(Int.box): _*))
    val scored = vectors
      .join(broadcast(probes), Seq("__cluster"))
      .filter(col("query_id") =!= col("__id"))
      .select(col("query_id"), col("__id").as("neighbor_id"),
        Similarity.cosine(col("__qv"), col("__vec")).as("cosine"))
    topKPerQuery(scored, "cosine", "neighbor_id", k)
  }

  // ------------------------------------------------------------ IVF×PQ
  /** Build the composed IVF×PQ index (FAISS layout with global codebooks,
    * `by_residual=false`): coarse centroids + PQ codebooks trained on
    * bounded samples, full corpus assigned + encoded exactly once, and
    * codes written partitioned by coarse cluster. The cluster-attach join
    * runs HERE — one build-time shuffle — so queries never pay it.
    */
  def buildIvfPq(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      nlist: Int, m: Int, ksub: Int, iters: Int = 2,
      maxTrainRows: Int = 0): Unit = {
    val spark = corpus.sparkSession
    val coarse = Similarity.trainCentroids(corpus, idCol, vecCol, nlist, iters,
      maxTrainRows)
    val clusterOf = Similarity.assign(corpus, (idCol, vecCol), coarse)
      .select(qcol(idCol).cast("long").as("__id"), col("__cluster"))
    val model = Similarity.pqModel(corpus, idCol, vecCol, m, ksub, iters,
      maxTrainRows)
    writeMeta(spark, dir, model.m, model.sub, nlist)
    coarse.write.mode("overwrite").parquet(s"$dir/coarse")
    model.centroids.write.mode("overwrite").parquet(s"$dir/codebooks")
    model.codes.join(clusterOf, Seq("__id"))
      .write.partitionBy("__cluster").mode("overwrite").parquet(s"$dir/codes")
  }

  def readIvfPq(spark: SparkSession, dir: String): IvfPqIndex = {
    val (m, sub, nlist) = readMeta(spark, dir)
    require(nlist > 0, s"$dir is a flat PQ index, not IVF×PQ (nlist=$nlist)")
    IvfPqIndex(spark.read.parquet(s"$dir/coarse"),
      spark.read.parquet(s"$dir/codebooks"), s"$dir/codes", m, sub)
  }

  /** IVF×PQ top-k against the persisted index. The query path:
    *
    *   1. nprobe coarse clusters per query (broadcast nlist centroids);
    *   2. the UNION of probed clusters across the batch (≤ nlist values —
    *      a bounded collect) becomes an `isin` PartitionFilter, so the
    *      parquet source reads only the probed cluster directories;
    *   3. per-(query, cluster) assignment rides a broadcast join, ADC
    *      partial dots another; one hash aggregate sums m terms per
    *      scored pair.
    *
    * No shuffle touches anything corpus-sized: the only exchange is the
    * final groupBy over (query, candidate-in-probed-cluster) pairs.
    */
  def ivfPqTopK(spark: SparkSession, index: IvfPqIndex, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val q = queries.select(qcol(idCol).cast("long").as("query_id"),
      qcol(vecCol).as("__qv"))
    val probes = probeClusters(q, index.coarse, nprobe)
      .select(col("query_id"), col("__cluster"))
      .localCheckpoint(eager = true) // reused by the collect AND the join
    val probed = probes.select(col("__cluster")).distinct()
      .collect().map(_.getInt(0)) // ≤ nlist values by construction
    val codes = spark.read.parquet(index.codesPath)
      .filter(col("__cluster").isin(probed.map(Int.box): _*))
    val scored = codes
      .join(broadcast(probes), Seq("__cluster"))
      .filter(col("query_id") =!= col("__id"))
      .join(broadcast(pqLut(queries, idCol, vecCol, index.codebooks,
        index.m, index.sub)), Seq("query_id", "__j", "__code"))
      .groupBy(col("query_id"), col("__id"))
      .agg(sum(col("__p")).as("cosine_pq"))
      .withColumnRenamed("__id", "neighbor_id")
    topKPerQuery(scored, "cosine_pq", "neighbor_id", k)
  }

  // ------------------------------------------------------ atomic rebuild
  /** Atomic index REBUILD: the periodic retrain that resets append
    * drift. The new generation builds in a sibling temp directory, then
    * replaces `dir` through the two-move swap protocol the table
    * upserts already use ([[graft.operators.Upsert.swapDirs]]) — a
    * concurrent reader holds either the old generation or the new one,
    * never a half-written index (the plain builders' in-place overwrite
    * of meta/codebooks/codes is NOT safe under concurrent reads).
    */
  def rebuildPq(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      m: Int, ksub: Int, iters: Int = 2, maxTrainRows: Int = 0): Unit = {
    val tmp = dir + ".build-" + System.nanoTime()
    buildPq(corpus, idCol, vecCol, tmp, m, ksub, iters, maxTrainRows)
    graft.operators.Upsert.swapDirs(tmp, dir)
  }

  /** [[rebuildPq]] for the IVF-flat layout. */
  def rebuildIvf(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      nlist: Int, iters: Int = 2, maxTrainRows: Int = 0): Unit = {
    val tmp = dir + ".build-" + System.nanoTime()
    buildIvf(corpus, idCol, vecCol, tmp, nlist, iters, maxTrainRows)
    graft.operators.Upsert.swapDirs(tmp, dir)
  }

  /** [[rebuildPq]] for the IVF×PQ layout. */
  def rebuildIvfPq(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      nlist: Int, m: Int, ksub: Int, iters: Int = 2,
      maxTrainRows: Int = 0): Unit = {
    val tmp = dir + ".build-" + System.nanoTime()
    buildIvfPq(corpus, idCol, vecCol, tmp, nlist, m, ksub, iters, maxTrainRows)
    graft.operators.Upsert.swapDirs(tmp, dir)
  }

  // ----------------------------------------------------- incremental append
  /** Append new corpus rows to a persisted index WITHOUT retraining —
    * the maintenance operation between periodic rebuilds. Codebooks
    * (and for the IVF layouts the coarse quantizer) are FROZEN: new
    * vectors are assigned/encoded against the stored tables and their
    * codes/vectors appended to the on-disk layout (parquet append
    * respects the cluster partitioning, so new rows land in their
    * cluster directories and partition pruning keeps working). Encoding
    * is deterministic given the codebooks, so append(build(A), B)
    * equals encode(A∪B) against A's codebooks EXACTLY — the
    * `x_knn_pq_append` gate pins it. Quantization quality drifts as the
    * data distribution moves away from the training sample; that is the
    * standard trade (FAISS `add` semantics) — rebuild on your cadence,
    * append in between. Caller owns id uniqueness across appends.
    */
  def appendPq(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val model = readPq(spark, dir)
    Similarity.pqEncode(rows, idCol, vecCol, model.centroids, model.m, model.sub)
      .write.mode("append").parquet(s"$dir/codes")
  }

  /** [[appendPq]] for the IVF-flat layout: assign against the frozen
    * coarse centroids, append into the cluster partitions.
    */
  def appendIvf(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val index = readIvf(spark, dir)
    Similarity.assign(rows, (idCol, vecCol), index.coarse)
      .select(qcol(idCol).cast("long").as("__id"), qcol(vecCol).as("__vec"),
        col("__cluster"))
      .write.mode("append").partitionBy("__cluster").parquet(index.vectorsPath)
  }

  /** [[appendPq]] for the IVF×PQ layout: frozen coarse quantizer AND
    * frozen codebooks; one assign + one encode of the new rows, appended
    * into the cluster partitions.
    */
  def appendIvfPq(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val index = readIvfPq(spark, dir)
    val coarse = index.coarse
    val clusterOf = Similarity.assign(rows, (idCol, vecCol), coarse)
      .select(qcol(idCol).cast("long").as("__id"), col("__cluster"))
    Similarity.pqEncode(rows, idCol, vecCol, index.codebooks, index.m, index.sub)
      .join(clusterOf, Seq("__id"))
      .write.mode("append").partitionBy("__cluster").parquet(index.codesPath)
  }

  /** Build-and-query convenience for tests/gates: stages the index under
    * `dir` and answers one query batch through the pruned path.
    */
  def ivfPqTopKVia(dir: String, queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, nlist: Int, nprobe: Int,
      m: Int, ksub: Int, iters: Int = 2, maxTrainRows: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    buildIvfPq(corpus, idCol, vecCol, dir, nlist, m, ksub, iters, maxTrainRows)
    ivfPqTopK(spark, readIvfPq(spark, dir), queries, idCol, vecCol, k, nprobe)
  }
}
