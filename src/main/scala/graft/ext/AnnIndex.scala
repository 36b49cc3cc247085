package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *   codes/      (__id, __j, __code, __seq)    — flat PQ
  *               (__cluster=K/ …)              — IVF×PQ, cluster-partitioned
  *   vectors/    (__id, __vec, __seq, __cluster=K/) — IVF-flat; also kept
  *               by IVF×PQ when built with `keepVectors` (refine re-rank)
  *   tombstones/ (__id, __seq)                 — delete/update log
  * }}}
  *
  * Maintenance model (FAISS `remove_ids`/`add` semantics): every stored
  * row carries the maintenance sequence number `__seq` it was written at
  * (0 for the initial build). [[deleteIds]] appends (id, seq) tombstones;
  * a stored row is LIVE iff it was written AFTER the newest tombstone for
  * its id, so delete → re-append (= [[updatePq]] etc.) supersedes the
  * tombstone instead of being killed by it. Query paths subtract the
  * tombstone table through one broadcast join (the table is
  * delete-volume-sized, not corpus-sized); [[rebuildPq]] and friends
  * compact — the fresh generation carries no tombstones.
  *
  * Concurrency: readers are safe against [[rebuildPq]]'s two-move swap,
  * but MAINTENANCE ops (append/delete/update) racing a rebuild of the
  * same index can land writes in the generation the swap is about to
  * discard — the caller must serialize maintenance against rebuilds of
  * one index (a lock/lease around the maintenance window); appends and
  * deletes among themselves are append-only and need only the id-
  * uniqueness discipline documented on [[appendPq]].
  */
object AnnIndex {

  // ------------------------------------------------ tombstones / liveness
  private def tombstonesPath(dir: String) = s"$dir/tombstones"

  // existence probes go through the Hadoop FS layer like the reads/writes
  // themselves — a java.io.File check against a non-local index dir
  // (hdfs://, s3a://) would answer "absent" and silently serve deleted rows
  private def readTombstones(spark: SparkSession, dir: String): Option[DataFrame] =
    if (graft.util.Hfs.exists(spark, tombstonesPath(dir)))
      Some(spark.read.parquet(tombstonesPath(dir)))
    else None

  /** Sequence number the NEXT maintenance write (append or delete) gets:
    * one past the newest tombstone. Appends between deletes may share a
    * number — liveness only compares row seq against TOMBSTONE seq, and
    * a delete always bumps past every row it must kill.
    *
    * Read from the `_next_seq` sidecar when present — one tiny file read
    * per maintenance op instead of a max(__seq) column scan whose cost
    * grows with the tombstone log (a streaming append pays this EVERY
    * micro-batch; same discipline as
    * [[graft.ext.IncrementalComponents]]'s label-store sidecar). A
    * pre-sidecar index pays the scan until its next delete writes the
    * sidecar; compaction/rebuild swaps the whole index dir, so the
    * sidecar resets together with the tombstone log it numbers.
    */
  private[ext] def nextSeq(spark: SparkSession, dir: String): Long = {
    val f = s"$dir/_next_seq"
    if (graft.util.Hfs.exists(spark, f))
      graft.util.Hfs.readString(spark, f).trim.toLong
    else readTombstones(spark, dir)
      // max over ZERO rows is null (an empty ids frame still writes a
      // schema-only tombstones dir) — treat it like no tombstones at all
      .flatMap(t => Option(t.agg(max(col("__seq"))).head().get(0)))
      .map(_.asInstanceOf[Long] + 1L)
      .getOrElse(0L)
  }

  /** Keep only live rows: a row is dead iff a tombstone for its id exists
    * with tombstone seq >= row seq. One broadcast join against the per-id
    * max of the tombstone table — nothing corpus-sized moves.
    *
    * NOT a newest-generation filter: two un-tombstoned generations of one
    * id (a duplicate bare append) both survive — see the append docs for
    * why that contract lives with the caller instead of a per-query
    * corpus-wide max-seq shuffle here.
    */
  private[ext] def liveOnly(spark: SparkSession, dir: String, rows: DataFrame): DataFrame =
    liveAsOf(spark, dir, rows, None)

  /** [[liveOnly]] with an optional TIME-TRAVEL horizon: `asOf = Some(S)`
    * answers with the index state after every maintenance epoch ≤ S and
    * none after — rows written at `__seq ≤ S`, killed only by tombstones
    * with `__seq ≤ S` (the usual tseq ≥ rowseq rule within the cut).
    *
    * The epoch clock is the tombstone sequence ([[nextSeq]]): every
    * non-empty DELETE advances it; appends land in the current epoch.
    * An UPDATE is therefore two epochs — its tombstone's S shows the id
    * absent (mid-update), S+1 shows the new generation — and a snapshot
    * between the halves of an update is exactly what those two cuts
    * return. Retention: compaction/rebuild collapse history to the
    * current state (seq resets, tombstones drop — the same trade every
    * log-structured store makes; cf. Delta VACUUM vs time travel), so
    * as-of reads answer within the history SINCE the last compaction;
    * horizons at or past the current epoch equal the live view.
    */
  private[ext] def liveAsOf(spark: SparkSession, dir: String, rows: DataFrame,
      asOf: Option[Long]): DataFrame = {
    // legacy rows written before the tombstone layout carry no __seq —
    // treat them as generation 0
    val seq = if (rows.columns.contains("__seq"))
      coalesce(col("__seq"), lit(0L)) else lit(0L)
    val cutRows = asOf match {
      case Some(s0) => rows.filter(seq <= s0)
      case None => rows
    }
    readTombstones(spark, dir)
      .map(t => asOf.map(s0 => t.filter(col("__seq") <= s0)).getOrElse(t)) match {
      case None => cutRows
      case Some(t) =>
        val dead = t.groupBy(col("__id")).agg(max(col("__seq")).as("__tseq"))
        cutRows.join(broadcast(dead), Seq("__id"), "left")
          .filter(col("__tseq").isNull || seq > col("__tseq"))
          .drop("__tseq")
    }
  }

  /** Delete ids from a persisted index (any layout) by appending
    * tombstones — the FAISS `remove_ids` maintenance op, O(|ids|): no
    * codes/vectors file is rewritten; the query path subtracts the
    * tombstone table via one broadcast join and the next rebuild
    * compacts. Deleting an absent id is a harmless no-op tombstone.
    *
    * A PCA-PQ ROOT delegates to its nested `dir/pq` (where the query
    * path reads liveness) — tombstones written at the root would be
    * subtracted by nothing and the "deleted" rows would keep being
    * served silently, which is how every wrong layout routing here
    * must fail: loudly or not at all.
    */
  def deleteIds(spark: SparkSession, dir: String, ids: DataFrame, idCol: String): Unit = {
    if (graft.util.Hfs.exists(spark, s"$dir/meta")) {
      // schema-tolerant sniff: deleteIds also serves NON-ANN tombstone
      // consumers (the inverted text index) whose meta has a different
      // shape — only an explicit layout = pcapq reroutes
      val m = spark.read.parquet(s"$dir/meta")
      if (m.columns.contains("layout")) {
        val l = m.head().getAs[String]("layout")
        if (Set("pcapq", "opq")(l))
          return deleteIds(spark, s"$dir/pq", ids, idCol)
        if (l == "opqivfpq")
          return deleteIds(spark, s"$dir/ivfpq", ids, idCol)
      }
    }
    val seq = nextSeq(spark, dir)
    val dead = ids.select(qcol(idCol).cast("long").as("__id")).distinct()
      .localCheckpoint(eager = true) // consumed by the emptiness probe AND the write
    // sidecar FIRST, tombstones second (the IncrementalComponents crash
    // discipline): a crash between the two leaves a gap in the sequence
    // (harmless); the reverse order could hand a later APPEND the same
    // number as an unrecorded delete's tombstones, which would kill it.
    // Only NON-EMPTY deletes bump the counter — an empty ids frame (the
    // insert-only CDC diff) leaves max(__seq) unchanged on the scan
    // path, and skipping the bump keeps the sidecar numbering
    // byte-identical to it in every history.
    if (!dead.isEmpty)
      graft.util.Hfs.writeString(spark, s"$dir/_next_seq", (seq + 1L).toString)
    dead.withColumn("__seq", lit(seq))
      .write.mode("append").parquet(tombstonesPath(dir))
  }

  /** A loaded IVF×PQ index: coarse centroids + codebooks in hand, codes
    * left ON DISK (`codesPath`) so each query plans its own pruned scan.
    * `dir` is the index root (tombstones, optional refine vectors).
    * `residual` marks codebooks trained on coarse-centroid residuals
    * (FAISS `by_residual=true`) — the query path then adds the
    * per-(query, cluster) ⟨q̂, ĉ⟩ offset to the ADC sum.
    */
  final case class IvfPqIndex(coarse: DataFrame, codebooks: DataFrame,
      codesPath: String, m: Int, sub: Int, dir: String,
      residual: Boolean = false)

  private[ext] def writeMeta(spark: SparkSession, dir: String, m: Int, sub: Int,
      nlist: Int, residual: Boolean = false, layout: String = ""): Unit = {
    import spark.implicits._
    val l = if (layout.nonEmpty) layout else derivedLayout(m, nlist)
    Seq((m, sub, nlist, residual, l)).toDF("m", "sub", "nlist", "residual", "layout")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** The PQ-era layouts encoded their kind in (m, nlist); SQ layouts
    * need it explicit (IVF×SQ's (m=0, nlist>0) would read as IVF-flat).
    */
  private def derivedLayout(m: Int, nlist: Int): String =
    if (nlist == -1) "pq" else if (m == 0) "ivf" else "ivfpq"

  /** (m, sub, nlist, residual); indexes written before the residual
    * column existed read as residual = false — exactly their semantics.
    */
  private def readMeta(spark: SparkSession, dir: String): (Int, Int, Int, Boolean) = {
    val df = spark.read.parquet(s"$dir/meta")
    val r = df.head()
    val residual =
      if (df.columns.contains("residual")) r.getAs[Boolean]("residual") else false
    (r.getAs[Int]("m"), r.getAs[Int]("sub"), r.getAs[Int]("nlist"), residual)
  }

  /** The index kind: pq / ivf / ivfpq / sq / ivfsq / bq. Pre-layout-
    * column metas derive from (m, nlist) — exactly the old implicit
    * encoding.
    */
  private[ext] def readLayout(spark: SparkSession, dir: String): String = {
    val df = spark.read.parquet(s"$dir/meta")
    val r = df.head()
    if (df.columns.contains("layout")) r.getAs[String]("layout")
    else derivedLayout(r.getAs[Int]("m"), r.getAs[Int]("nlist"))
  }

  // ----------------------------------------------------------- flat PQ
  /** Persist a trained PQ model (codebooks + corpus codes) as parquet. */
  def writePq(model: PqModel, dir: String): Unit = {
    val spark = model.centroids.sparkSession
    writeMeta(spark, dir, model.m, model.sub, nlist = -1)
    model.centroids.write.mode("overwrite").parquet(s"$dir/codebooks")
    model.codes.withColumn("__seq", lit(0L))
      .write.mode("overwrite").parquet(s"$dir/codes")
  }

  /** Train + encode + persist in one call (the index-build job).
    * `modelIn` supplies an already-trained model (codebooks + codes of
    * THIS corpus at this geometry) and skips training entirely — the
    * FAISS provide-your-own-quantizer shape, used when several layouts
    * over one corpus share one training (e.g. flat PQ beside IVF×PQ:
    * identical sub-quantizers by construction, trained once).
    */
  def buildPq(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      m: Int, ksub: Int, iters: Int = 2, maxTrainRows: Int = 0,
      modelIn: Option[PqModel] = None): Unit =
    writePq(modelIn.getOrElse(
      Similarity.pqModel(corpus, idCol, vecCol, m, ksub, iters, maxTrainRows)), dir)

  /** Load a persisted PQ index as a [[Similarity.PqModel]] — drop-in for
    * `pqScores`/`pqTopK` query paths, with zero training cost.
    */
  def readPq(spark: SparkSession, dir: String): PqModel =
    readPqAsOf(spark, dir, None)

  /** [[readPq]] at a time-travel horizon ([[liveAsOf]]): the codes view
    * as of maintenance epoch ≤ S. None = live view.
    */
  def readPqAsOf(spark: SparkSession, dir: String, asOf: Option[Long]): PqModel = {
    val (m, sub, _, _) = readMeta(spark, dir)
    PqModel(spark.read.parquet(s"$dir/codebooks"),
      liveAsOf(spark, dir, spark.read.parquet(s"$dir/codes"), asOf).drop("__seq"),
      m, sub)
  }

  /** PQ top-k against a persisted index (build once, query many).
    * `where` is FILTERED SEARCH over the stored codes scan (flat layout:
    * no partition pruning, but the predicate still evaluates pre-LUT,
    * pre-aggregate, so the top-k is exact over the predicate corpus).
    * Same per-ID-column contract as the IVF×PQ path: codes rows are
    * exploded per subvector, so the predicate must keep or drop WHOLE
    * ids (key on `__id`), never reference `__j`/`__code`.
    * `asOf` serves the index state at a maintenance epoch ([[liveAsOf]]).
    */
  def pqTopK(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      where: Column = lit(true), asOf: Option[Long] = None): DataFrame = {
    val model = readPqAsOf(spark, dir, asOf)
    Similarity.pqTopKWithModel(queries, idCol, vecCol,
      model.copy(codes = model.codes.filter(where)), k)
  }

  // ----------------------------------------------------------- IVF-flat
  /** A loaded IVF-flat index: coarse centroids in hand, full vectors left
    * ON DISK partitioned by cluster (`vectorsPath`). `dir` is the index
    * root (tombstones).
    */
  final case class IvfIndex(coarse: DataFrame, vectorsPath: String, nlist: Int,
      dir: String)

  /** Build the IVF-flat index: centroids trained on a bounded sample, the
    * full corpus assigned ONCE and written partitioned by cluster. The
    * in-memory [[Similarity.ivfTopK]] re-assigns the corpus per query
    * batch — fine ad hoc, but at 100 TB assignment is a full corpus pass
    * and the cluster join a corpus-sized shuffle; this layout pays both
    * once at build time.
    */
  def buildIvf(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      nlist: Int, iters: Int = 2, maxTrainRows: Int = 0,
      /** Already-trained coarse centroids (`__cid`, `centroid`) — skips
        * the kmeans; the shared-training shape of [[buildPq]]'s modelIn.
        */
      coarseIn: Option[DataFrame] = None): Unit = {
    val spark = corpus.sparkSession
    val coarse = coarseIn.getOrElse(
      Similarity.trainCentroids(corpus, idCol, vecCol, nlist, iters,
        maxTrainRows))
    writeMeta(spark, dir, m = 0, sub = 0, nlist)
    coarse.write.mode("overwrite").parquet(s"$dir/coarse")
    Similarity.assign(corpus, (idCol, vecCol), coarse)
      .select(qcol(idCol).cast("long").as("__id"), qcol(vecCol).as("__vec"),
        lit(0L).as("__seq"), col("__cluster"))
      .write.partitionBy("__cluster").mode("overwrite").parquet(s"$dir/vectors")
  }

  def readIvf(spark: SparkSession, dir: String): IvfIndex = {
    val (_, _, nlist, _) = readMeta(spark, dir)
    require(nlist > 0, s"$dir has no coarse quantizer (nlist=$nlist)")
    IvfIndex(spark.read.parquet(s"$dir/coarse"), s"$dir/vectors", nlist, dir)
  }

  /** IVF-flat top-k against the persisted index: nprobe coarse clusters
    * per query (broadcast centroids), the probed-cluster union as a
    * PartitionFilter on the vectors scan, exact codegen cosine on the
    * surviving nprobe/nlist of the corpus. Output shape matches
    * bruteForceTopK.
    *
    * `where` is FILTERED SEARCH (the production "ANN + metadata
    * predicate" shape): a predicate over the stored vector-table columns
    * (`__id`, `__vec`) applied INSIDE the pruned scan, before any score
    * is computed or joined — so the result is the exact top-k of the
    * probed ∩ predicate corpus (never the under-filled k that
    * post-filtering a top-k list yields). Pushable predicates
    * (comparisons/IN/null tests on stored columns) additionally reach
    * the parquet reader as PushedFilters; expression predicates (pmod,
    * arithmetic) evaluate in the scan's filter operator — still
    * pre-join, still pre-scoring.
    */
  def ivfTopK(spark: SparkSession, index: IvfIndex, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int,
      where: Column = lit(true)): DataFrame = {
    val q = queries.select(qcol(idCol).cast("long").as("query_id"),
      qcol(vecCol).as("__qv"))
    val probes = probeClusters(q, index.coarse, nprobe)
      .localCheckpoint(eager = true) // reused by the collect AND the join
    val probed = probes.select(col("__cluster")).distinct()
      .collect().map(_.getInt(0)) // ≤ nlist values by construction
    val vectors = liveOnly(spark, index.dir,
      spark.read.parquet(index.vectorsPath)
        .filter(col("__cluster").isin(probed.map(Int.box): _*))
        .filter(where))
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
      maxTrainRows: Int = 0,
      /** Also keep the exact vectors, cluster-partitioned like the codes
        * (FAISS refine/IndexRefineFlat shape): [[ivfPqTopKRefined]] then
        * re-scores the ADC shortlist against them. Costs the flat-vector
        * storage on top of the codes — the standard recall-for-space
        * trade.
        */
      keepVectors: Boolean = false,
      /** FAISS `by_residual`: train/encode PQ on coarse-centroid
        * residuals instead of the raw (normalized) vectors — the FAISS
        * accuracy default. Same storage layout and maintenance surface;
        * the query path adds a per-(query, probed-cluster) offset
        * ([[Similarity.residualOffsets]]). The flag is persisted in
        * `meta` and honored by append/update/compact/CDC.
        */
      byResidual: Boolean = false,
      /** Already-trained coarse centroids — see [[buildIvf]].coarseIn. */
      coarseIn: Option[DataFrame] = None,
      /** Already-trained RAW-space PQ model (codebooks + this corpus's
        * codes) — honored only when `byResidual` is false (a residual
        * index quantizes centroid residuals; raw-space codebooks would
        * silently mix score spaces, so it always trains its own).
        */
      modelIn: Option[PqModel] = None): Unit = {
    val spark = corpus.sparkSession
    val coarse = coarseIn.getOrElse(
      Similarity.trainCentroids(corpus, idCol, vecCol, nlist, iters,
        maxTrainRows))
    val assigned = Similarity.assign(corpus, (idCol, vecCol), coarse)
    if (byResidual) {
      val (codebooks, codes, sub) = Similarity.pqResidualModel(assigned,
        idCol, vecCol, coarse, m, ksub, iters, maxTrainRows)
      writeMeta(spark, dir, m, sub, nlist, residual = true)
      coarse.write.mode("overwrite").parquet(s"$dir/coarse")
      codebooks.write.mode("overwrite").parquet(s"$dir/codebooks")
      codes.withColumn("__seq", lit(0L))
        .write.partitionBy("__cluster").mode("overwrite").parquet(s"$dir/codes")
    } else {
      val clusterOf = assigned
        .select(qcol(idCol).cast("long").as("__id"), col("__cluster"))
      val model = modelIn.getOrElse(
        Similarity.pqModel(corpus, idCol, vecCol, m, ksub, iters,
          maxTrainRows))
      writeMeta(spark, dir, model.m, model.sub, nlist)
      coarse.write.mode("overwrite").parquet(s"$dir/coarse")
      model.centroids.write.mode("overwrite").parquet(s"$dir/codebooks")
      model.codes.join(clusterOf, Seq("__id")).withColumn("__seq", lit(0L))
        .write.partitionBy("__cluster").mode("overwrite").parquet(s"$dir/codes")
    }
    if (keepVectors)
      assigned
        .select(qcol(idCol).cast("long").as("__id"), qcol(vecCol).as("__vec"),
          lit(0L).as("__seq"), col("__cluster"))
        .write.partitionBy("__cluster").mode("overwrite").parquet(s"$dir/vectors")
  }

  def readIvfPq(spark: SparkSession, dir: String): IvfPqIndex = {
    val (m, sub, nlist, residual) = readMeta(spark, dir)
    require(nlist > 0, s"$dir is a flat PQ index, not IVF×PQ (nlist=$nlist)")
    IvfPqIndex(spark.read.parquet(s"$dir/coarse"),
      spark.read.parquet(s"$dir/codebooks"), s"$dir/codes", m, sub, dir,
      residual)
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
      idCol: String, vecCol: String, k: Int, nprobe: Int,
      where: Column = lit(true),
      /** Time-travel horizon ([[liveAsOf]]): serve the index state as of
        * maintenance epoch ≤ S. None = live view.
        */
      asOf: Option[Long] = None): DataFrame = {
    val (scored, _, _) =
      adcScored(spark, index, queries, idCol, vecCol, nprobe, where, asOf)
    topKPerQuery(scored, "cosine_pq", "neighbor_id", k)
  }

  /** The shared ADC scoring pipeline of [[ivfPqTopK]] and
    * [[ivfPqTopKRefined]]: returns (scored pairs, probed cluster ids,
    * broadcastable (query_id, __qv) frame).
    *
    * Residual indexes (`by_residual=true`) ride the SAME machinery: the
    * LUT sum then reconstructs ⟨q̂, r⟩ instead of ⟨q̂, v̂⟩, and the missing
    * ⟨q̂, ĉ⟩ term is one per-(query, probed-cluster) offset
    * ([[Similarity.residualOffsets]] — probes-sized, broadcast) added
    * after the aggregate. Grouping additionally by `__cluster` costs
    * nothing (a live id has exactly one cluster) and keeps the offset
    * join above the final cut.
    *
    * `where` is FILTERED SEARCH on the quantized layout (the [[ivfTopK]]
    * contract on the codes table): evaluated INSIDE the partition-pruned
    * codes scan, before the LUT join and the ADC aggregate, so the
    * top-k is the exact ADC top-k of the probed ∩ predicate corpus and
    * never under-fills. The predicate MUST key on per-ID columns
    * (`__id`, `__cluster`) only: codes rows are exploded per subvector
    * (`__j`, `__code`), and a predicate that kept some of an id's m
    * rows would silently truncate its ADC sum instead of excluding it.
    */
  private def adcScored(spark: SparkSession, index: IvfPqIndex,
      queries: DataFrame, idCol: String, vecCol: String,
      nprobe: Int, where: Column = lit(true),
      asOf: Option[Long] = None): (DataFrame, Array[Int], DataFrame) = {
    val q = queries.select(qcol(idCol).cast("long").as("query_id"),
      qcol(vecCol).as("__qv"))
    val probesFull = probeClusters(q, index.coarse, nprobe)
      .localCheckpoint(eager = true) // reused by the collect AND the joins
    val probes = probesFull.select(col("query_id"), col("__cluster"))
    val probed = probes.select(col("__cluster")).distinct()
      .collect().map(_.getInt(0)) // ≤ nlist values by construction
    val codes = liveAsOf(spark, index.dir,
      spark.read.parquet(index.codesPath)
        .filter(col("__cluster").isin(probed.map(Int.box): _*))
        .filter(where), asOf)
    val adc = codes
      .join(broadcast(probes), Seq("__cluster"))
      .filter(col("query_id") =!= col("__id"))
      .join(broadcast(pqLut(queries, idCol, vecCol, index.codebooks,
        index.m, index.sub)), Seq("query_id", "__j", "__code"))
    val scored =
      if (index.residual)
        adc.groupBy(col("query_id"), col("__cluster"), col("__id"))
          .agg(sum(col("__p")).as("__adc"))
          .join(broadcast(Similarity.residualOffsets(probesFull, index.coarse)),
            Seq("query_id", "__cluster"))
          .select(col("query_id"), col("__id").as("neighbor_id"),
            (col("__adc") + col("__off")).as("cosine_pq"))
      else
        adc.groupBy(col("query_id"), col("__id"))
          .agg(sum(col("__p")).as("cosine_pq"))
          .withColumnRenamed("__id", "neighbor_id")
    (scored, probed, q)
  }

  /** IVF×PQ top-k with an EXACT re-rank epilogue (the FAISS refine /
    * IndexRefineFlat stage): the ADC pipeline produces a top-(k·refine)
    * shortlist per query, the shortlist's exact vectors are fetched from
    * the index's cluster-partitioned `vectors/` table (kept by
    * `buildIvfPq(keepVectors = true)`), and exact cosine re-scores the
    * shortlist before the final cut to k — ADC misrankings INSIDE the
    * shortlist vanish, so recall@k is ≥ plain [[ivfPqTopK]] whenever the
    * true neighbors reach the shortlist at all.
    *
    * Scale shape (plan-asserted): the vectors scan is pruned to the SAME
    * probed cluster directories as the codes scan, and the shortlist
    * (queries × k·refine rows, broadcast-sized by construction) joins
    * into it as a broadcast — no corpus-sized shuffle joins the query
    * path; the only exchanges are over shortlist-sized frames.
    */
  def ivfPqTopKRefined(spark: SparkSession, index: IvfPqIndex,
      queries: DataFrame, idCol: String, vecCol: String, k: Int, nprobe: Int,
      refine: Int = 4, where: Column = lit(true)): DataFrame = {
    require(refine >= 1, s"refine factor must be >= 1: $refine")
    require(graft.util.Hfs.exists(spark, s"${index.dir}/vectors"),
      s"${index.dir} has no vectors/ table — build with keepVectors = true " +
        "to enable exact re-ranking")
    // `where` constrains the SHORTLIST (applied in the codes scan); the
    // exact re-rank joins by shortlist id, so the predicate holds
    // transitively without re-evaluating against the vectors table
    val (scored, probed, q) =
      adcScored(spark, index, queries, idCol, vecCol, nprobe, where)
    val shortlist = topKPerQuery(scored, "cosine_pq", "neighbor_id", k * refine)
      .select(col("query_id"), col("neighbor_id"))
      .join(q, Seq("query_id")) // attach the query vector (both tiny)
    val vectors = liveOnly(spark, index.dir,
      spark.read.parquet(s"${index.dir}/vectors")
        .filter(col("__cluster").isin(probed.map(Int.box): _*)))
      .select(col("__id").as("neighbor_id"), col("__vec"))
    val exact = vectors.join(broadcast(shortlist), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("__qv"), col("__vec")).as("cosine"))
    topKPerQuery(exact, "cosine", "neighbor_id", k)
  }

  // --------------------------------------------------------- flat SQ8
  /** A loaded SQ8 index: the dim-sized bounds in hand (they ARE the
    * model), codes read through [[liveOnly]]. See
    * [[Similarity.SqBounds]] for the analytic error-bound contract that
    * distinguishes this layout from PQ.
    */
  final case class SqIndex(bounds: Similarity.SqBounds, codes: DataFrame, dir: String)

  /** The bounds table IS the SQ model — one (de)serialization pair so
    * readers and writers cannot drift (dim rows: __pos, vmin, vmax).
    */
  private def writeBounds(spark: SparkSession, dir: String,
      b: Similarity.SqBounds): Unit = {
    import spark.implicits._
    b.vmin.indices.map(i => (i, b.vmin(i), b.vmax(i))).toDF("__pos", "vmin", "vmax")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/bounds")
  }

  private def readBounds(spark: SparkSession, dir: String): Similarity.SqBounds = {
    val rows = spark.read.parquet(s"$dir/bounds").orderBy(col("__pos")).collect()
    Similarity.SqBounds(
      rows.map(_.getAs[Double]("vmin")), rows.map(_.getAs[Double]("vmax")))
  }

  /** Build + persist the SQ8 index: exact per-dimension bounds (one
    * aggregation), the corpus encoded once, one byte per dimension in
    * the codes table. Layout: `bounds` (dim rows: __pos, vmin, vmax),
    * `codes` ((__id, __codes, __seq)), tombstones via [[deleteIds]] like
    * every other layout.
    */
  def buildSq(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      /** Already-computed exact bounds of THIS corpus — skips the
        * min/max aggregation; the shared-training shape of
        * [[buildPq]].modelIn.
        */
      boundsIn: Option[Similarity.SqBounds] = None): Unit = {
    val spark = corpus.sparkSession
    writeMeta(spark, dir, m = 0, sub = 0, nlist = -1, layout = "sq")
    val b = boundsIn.getOrElse(Similarity.sqTrainBounds(corpus, vecCol))
    writeBounds(spark, dir, b)
    Similarity.sqEncode(corpus, idCol, vecCol, b)
      .withColumn("__seq", lit(0L))
      .write.mode("overwrite").parquet(s"$dir/codes")
  }

  def readSq(spark: SparkSession, dir: String): SqIndex =
    SqIndex(readBounds(spark, dir),
      liveOnly(spark, dir, spark.read.parquet(s"$dir/codes")).drop("__seq"), dir)

  /** SQ top-k against a persisted index (build once, query many). */
  def sqTopK(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val idx = readSq(spark, dir)
    Similarity.sqTopKWithCodes(queries, idCol, vecCol, idx.bounds, idx.codes, k)
  }

  /** [[appendPq]] for the SQ layout: encode against the FROZEN bounds.
    * Appended vectors outside the trained per-dimension range CLAMP —
    * the analytic error bound covers build-corpus rows only; rebuild on
    * the usual cadence (same caller contract as every append, including
    * the duplicate-id rule above).
    */
  def appendSq(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    // only the bounds are needed — a full readSq would also probe
    // tombstones and open the codes schema just to discard that view
    val b = readBounds(spark, dir)
    val seq = nextSeq(spark, dir)
    Similarity.sqEncode(rows, idCol, vecCol, b)
      .withColumn("__seq", lit(seq))
      .write.mode("append").parquet(s"$dir/codes")
  }

  /** [[rebuildPq]] for the SQ layout (fresh bounds, swap-published). */
  def rebuildSq(corpus: DataFrame, idCol: String, vecCol: String, dir: String): Unit = {
    val tmp = dir + ".build-" + System.nanoTime()
    buildSq(corpus, idCol, vecCol, tmp)
    graft.operators.Upsert.swapDirs(tmp, dir)
  }

  // --------------------------------------------------- PCA-rotated PQ
  /** PCA-rotated product quantization — the FAISS
    * `IndexPreTransform(PCAMatrix, IndexPQ)` composition: an
    * uncentered-PCA rotation ([[Similarity.pcaRotation]] — a pure
    * rotation, so cosine is preserved EXACTLY) persisted beside a
    * standard flat-PQ index over the ROTATED corpus, nested at
    * `dir/pq`. Rotation compacts energy into the leading dimensions, so
    * the equal-width subspace split the PQ makes is better conditioned
    * — the classic OPQ initialization, without OPQ's alternating
    * optimization.
    *
    * Maintenance DELEGATES to the wrapped index exactly as in FAISS:
    * append/update/CDC rotate the batch and forward (frozen rotation +
    * frozen codebooks — same drift contract as every append), deletes
    * and compaction act on `dir/pq` directly (it is a plain PQ index;
    * `tombstoneDebt`/`compactIfNeeded` on `dir/pq` route as "pq").
    */
  final case class PcaPqIndex(rotation: Array[Array[Double]], pqDir: String,
      dir: String)

  private def writeRotation(spark: SparkSession, dir: String,
      r: Array[Array[Double]]): Unit = {
    import spark.implicits._
    r.indices.map(i => (i, r(i).toSeq)).toDF("__i", "__row")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/rotation")
  }

  private def readRotation(spark: SparkSession, dir: String): Array[Array[Double]] =
    spark.read.parquet(s"$dir/rotation").orderBy(col("__i"))
      .collect().map(_.getSeq[Double](1).toArray)

  def buildPcaPq(corpus: DataFrame, idCol: String, vecCol: String,
      dir: String, dim: Int, m: Int, ksub: Int, iters: Int = 2,
      maxTrainRows: Int = 0): Unit = {
    val spark = corpus.sparkSession
    val r = Similarity.pcaRotation(corpus, idCol, vecCol, dim,
      maxTrainRows = if (maxTrainRows > 0) maxTrainRows else 4096)
    writeMeta(spark, dir, m = 0, sub = 0, nlist = -1, layout = "pcapq")
    writeRotation(spark, dir, r)
    buildPq(corpus.select(qcol(idCol).as("__rid"),
        Similarity.rotateExpr(qcol(vecCol), r).as("__rvec")),
      "__rid", "__rvec", s"$dir/pq", m, ksub, iters)
  }

  def readPcaPq(spark: SparkSession, dir: String): PcaPqIndex = {
    require(readLayout(spark, dir) == "pcapq",
      s"$dir is not a PCA-PQ index — each layout has its own reader")
    PcaPqIndex(readRotation(spark, dir), s"$dir/pq", dir)
  }

  /** PCA-PQ top-k: queries rotated against the stored matrix, then the
    * standard persisted-PQ ADC path over the rotated codes. `where`
    * filters the stored codes pre-scoring ([[pqTopK]]'s contract —
    * rotation touches vectors, not ids, so id predicates pass through
    * unchanged).
    */
  def pcaPqTopK(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      where: Column = lit(true)): DataFrame = {
    val idx = readPcaPq(spark, dir)
    pqTopK(spark, idx.pqDir,
      queries.select(qcol(idCol).as("__rid"),
        Similarity.rotateExpr(qcol(vecCol), idx.rotation).as("__rvec")),
      "__rid", "__rvec", k, where)
  }

  // ------------------------------------------------------------- OPQ
  /** OPQ index (FAISS `OPQMatrix` + `IndexPreTransform` composition):
    * the [[Similarity.opqRotation]] alternating-minimization rotation —
    * the transform PCA-PQ only approximates — persisted in the same
    * rotation + nested-PQ layout as PCA-PQ, so serving, maintenance and
    * compaction all reuse that machinery. Final codebooks are retrained
    * DISTRIBUTED over the full rotated corpus (the [[buildPcaPq]]
    * discipline); the driver-sample codebooks exist only inside the
    * rotation's training loop.
    */
  def buildOpq(corpus: DataFrame, idCol: String, vecCol: String,
      dir: String, dim: Int, m: Int, ksub: Int, iters: Int = 2,
      opqIters: Int = 3, maxTrainRows: Int = 0): Unit = {
    val spark = corpus.sparkSession
    val r = Similarity.opqRotation(corpus, idCol, vecCol, dim, m, ksub,
      opqIters, maxTrainRows = if (maxTrainRows > 0) maxTrainRows else 1024)
    writeMeta(spark, dir, m = 0, sub = 0, nlist = -1, layout = "opq")
    writeRotation(spark, dir, r)
    buildPq(corpus.select(qcol(idCol).as("__rid"),
        Similarity.rotateExpr(qcol(vecCol), r).as("__rvec")),
      "__rid", "__rvec", s"$dir/pq", m, ksub, iters)
  }

  def readOpq(spark: SparkSession, dir: String): PcaPqIndex = {
    require(readLayout(spark, dir) == "opq",
      s"$dir is not an OPQ index — each layout has its own reader")
    PcaPqIndex(readRotation(spark, dir), s"$dir/pq", dir)
  }

  /** OPQ top-k — identical query path to [[pcaPqTopK]] under the OPQ
    * rotation: rotate queries, ADC over the nested PQ index.
    */
  def opqTopK(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      where: Column = lit(true)): DataFrame = {
    val idx = readOpq(spark, dir)
    pqTopK(spark, idx.pqDir,
      queries.select(qcol(idCol).as("__rid"),
        Similarity.rotateExpr(qcol(vecCol), idx.rotation).as("__rvec")),
      "__rid", "__rvec", k, where)
  }

  /** OPQ × IVF-PQ — the FAISS production index string
    * (`OPQm,IVFnlist,PQm`): the learned rotation in front of the
    * cluster-partitioned codes layout, so the serving path composes
    * BOTH scale levers — nprobe partition pruning AND the
    * rotation-conditioned quantizer. Coarse centroids and codebooks
    * train in the ROTATED space; queries rotate once, then ride the
    * standard IVF-PQ pruned ADC path.
    */
  def buildOpqIvfPq(corpus: DataFrame, idCol: String, vecCol: String,
      dir: String, dim: Int, nlist: Int, m: Int, ksub: Int, iters: Int = 2,
      opqIters: Int = 3, maxTrainRows: Int = 0): Unit = {
    val spark = corpus.sparkSession
    val r = Similarity.opqRotation(corpus, idCol, vecCol, dim, m, ksub,
      opqIters, maxTrainRows = if (maxTrainRows > 0) maxTrainRows else 1024)
    writeMeta(spark, dir, m = 0, sub = 0, nlist = -1, layout = "opqivfpq")
    writeRotation(spark, dir, r)
    buildIvfPq(corpus.select(qcol(idCol).as("__rid"),
        Similarity.rotateExpr(qcol(vecCol), r).as("__rvec")),
      "__rid", "__rvec", s"$dir/ivfpq", nlist, m, ksub, iters)
  }

  def readOpqIvfPq(spark: SparkSession, dir: String): PcaPqIndex = {
    require(readLayout(spark, dir) == "opqivfpq",
      s"$dir is not an OPQ×IVF-PQ index — each layout has its own reader")
    PcaPqIndex(readRotation(spark, dir), s"$dir/ivfpq", dir)
  }

  /** Rotate queries against the stored matrix, then the partition-pruned
    * IVF-PQ ADC path over the nested index.
    */
  def opqIvfPqTopK(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int,
      where: Column = lit(true)): DataFrame = {
    val idx = readOpqIvfPq(spark, dir)
    ivfPqTopK(spark, readIvfPq(spark, idx.pqDir),
      queries.select(qcol(idCol).as("__rid"),
        Similarity.rotateExpr(qcol(vecCol), idx.rotation).as("__rvec")),
      "__rid", "__rvec", k, nprobe, where)
  }

  /** [[appendIvfPq]] through the OPQ rotation (frozen rotation, coarse
    * quantizer and codebooks).
    */
  def appendOpqIvfPq(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val idx = readOpqIvfPq(spark, dir)
    appendIvfPq(spark, idx.pqDir,
      rows.select(qcol(idCol).as("__rid"),
        Similarity.rotateExpr(qcol(vecCol), idx.rotation).as("__rvec")),
      "__rid", "__rvec")
  }

  /** [[appendPq]] through the OPQ rotation (frozen rotation + codebooks). */
  def appendOpq(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val idx = readOpq(spark, dir)
    appendPq(spark, idx.pqDir,
      rows.select(qcol(idCol).as("__rid"),
        Similarity.rotateExpr(qcol(vecCol), idx.rotation).as("__rvec")),
      "__rid", "__rvec")
  }

  /** [[appendPq]] through the rotation (frozen rotation + codebooks). */
  def appendPcaPq(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val idx = readPcaPq(spark, dir)
    appendPq(spark, idx.pqDir,
      rows.select(qcol(idCol).as("__rid"),
        Similarity.rotateExpr(qcol(vecCol), idx.rotation).as("__rvec")),
      "__rid", "__rvec")
  }

  def deletePcaPq(spark: SparkSession, dir: String, ids: DataFrame,
      idCol: String): Unit =
    deleteIds(spark, s"$dir/pq", ids, idCol)

  def updatePcaPq(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    deletePcaPq(spark, dir, rows, idCol)
    appendPcaPq(spark, dir, rows, idCol, vecCol)
  }

  def applyDiffPcaPq(spark: SparkSession, dir: String, diff: DataFrame,
      keyCol: String, rows: DataFrame, idCol: String, vecCol: String): Unit = {
    val (dels, upserts) = diffSplit(diff, keyCol, rows, idCol)
    deletePcaPq(spark, dir, dels, keyCol)
    appendPcaPq(spark, dir, upserts, idCol, vecCol)
  }

  /** Compaction delegates to the wrapped PQ index (rotation untouched —
    * it has no per-row state).
    */
  def compactPcaPq(spark: SparkSession, dir: String): Unit = {
    require(readLayout(spark, dir) == "pcapq",
      s"$dir is not a PCA-PQ index — each layout has its own compaction")
    compactPq(spark, s"$dir/pq")
  }

  def rebuildPcaPq(corpus: DataFrame, idCol: String, vecCol: String,
      dir: String, dim: Int, m: Int, ksub: Int, iters: Int = 2): Unit = {
    val tmp = dir + ".build-" + System.nanoTime()
    buildPcaPq(corpus, idCol, vecCol, tmp, dim, m, ksub, iters)
    graft.operators.Upsert.swapDirs(tmp, dir)
  }

  // ------------------------------------------------------------ flat BQ
  /** A loaded binary-quantization index: one codes table on disk holding
    * (__id, __sig array&lt;long&gt;, __vec, __seq) — the 1-bit/dim sign
    * sketches ([[Similarity.signSketch]]) BESIDE the full-precision
    * vectors, in one parquet table whose COLUMN PRUNING is the layout's
    * two-tier storage: the hamming scan reads only (__id, __sig, __seq)
    * (dim/8 bytes + ids per row), the exact rescore re-opens the table
    * for (__id, __vec) restricted to the nq×shortlist survivors.
    * Training-free (the sketch has no learned parameters), so append ==
    * rebuild EXACTLY and there is no drift-rebuild cadence — the only
    * rebuild reason is tombstone debt.
    */
  final case class BqIndex(codesPath: String, dim: Int, dir: String)

  private def readDim(spark: SparkSession, dir: String): Int =
    graft.util.Hfs.readString(spark, s"$dir/_dim").trim.toInt

  /** Build + persist the BQ index: corpus sketched once (`dim` must be
    * every vector's length — recorded in a `_dim` sidecar so queries and
    * appends sketch against the same geometry).
    */
  def buildBq(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      dim: Int): Unit = {
    require(dim > 0, s"dim must be positive: $dim")
    val spark = corpus.sparkSession
    writeMeta(spark, dir, m = 0, sub = 0, nlist = -1, layout = "bq")
    graft.util.Hfs.writeString(spark, s"$dir/_dim", dim.toString)
    corpus.select(qcol(idCol).cast("long").as("__id"),
        Similarity.signSketch(qcol(vecCol), dim).as("__sig"),
        qcol(vecCol).as("__vec"), lit(0L).as("__seq"))
      .write.mode("overwrite").parquet(s"$dir/codes")
  }

  def readBq(spark: SparkSession, dir: String): BqIndex = {
    require(readLayout(spark, dir) == "bq",
      s"$dir is not a BQ index — each layout has its own reader")
    BqIndex(s"$dir/codes", readDim(spark, dir), dir)
  }

  /** BQ top-k against the persisted index: hamming over the pruned
    * (__id, __sig) columns, exact cosine rescore of the shortlist from
    * the same table's __vec column — [[Similarity.binarySketchTopK]]
    * semantics over the build-once layout, tombstones subtracted.
    */
  /** `where`: FILTERED binary-quantized search — the [[ivfTopK]]
    * predicate contract on this layout's stored columns (`__id`,
    * `__sig`, `__vec`): applied inside BOTH column-pruned scans (the
    * hamming pass and the exact rescore read the same filtered live
    * set), before any score, so the result is the exact top-k of the
    * predicate corpus and the shortlist never under-fills.
    */
  def bqTopK(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, shortlist: Int = 50,
      where: Column = lit(true)): DataFrame = {
    val idx = readBq(spark, dir)
    val stored = spark.read.parquet(idx.codesPath).filter(where)
    Similarity.bqSearch(
      queries.select(qcol(idCol).cast("long").as("query_id"),
        qcol(vecCol).as("__qv"),
        Similarity.signSketch(qcol(vecCol), idx.dim).as("__qs")),
      liveOnly(spark, dir, stored.select(col("__id"), col("__sig"), col("__seq")))
        .select(col("__id").as("neighbor_id"), col("__sig").as("__cs")),
      liveOnly(spark, dir, stored.select(col("__id"), col("__vec"), col("__seq")))
        .select(col("__id").as("neighbor_id"), col("__vec").as("__cv")),
      k, shortlist)
  }

  /** [[appendPq]] for the BQ layout — nothing is trained, so append ==
    * rebuild exactly (no quantization drift; same duplicate-id caller
    * contract as every append).
    */
  def appendBq(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val dim = readDim(spark, dir)
    val seq = nextSeq(spark, dir)
    rows.select(qcol(idCol).cast("long").as("__id"),
        Similarity.signSketch(qcol(vecCol), dim).as("__sig"),
        qcol(vecCol).as("__vec"), lit(seq).as("__seq"))
      .write.mode("append").parquet(s"$dir/codes")
  }

  def updateBq(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    deleteIds(spark, dir, rows, idCol)
    appendBq(spark, dir, rows, idCol, vecCol)
  }

  /** [[compactPq]] for the BQ layout: live rows rewritten (sketches are
    * parameter-free — carried as stored), swap-published, tombstone log
    * reset; all-dead refusal as in every layout.
    */
  def compactBq(spark: SparkSession, dir: String): Unit = {
    require(readLayout(spark, dir) == "bq",
      s"$dir is not a BQ index — each layout has its own compaction")
    val tmp = dir + ".compact-" + System.nanoTime()
    val live = requireLive(
      liveOnly(spark, dir, spark.read.parquet(s"$dir/codes")), dir)
    writeMeta(spark, tmp, m = 0, sub = 0, nlist = -1, layout = "bq")
    graft.util.Hfs.writeString(spark, s"$tmp/_dim",
      readDim(spark, dir).toString)
    live.withColumn("__seq", lit(0L))
      .write.mode("overwrite").parquet(s"$tmp/codes")
    graft.operators.Upsert.swapDirs(tmp, dir)
  }

  /** [[applyDiffIvfPq]] for the BQ layout. */
  def applyDiffBq(spark: SparkSession, dir: String, diff: DataFrame,
      keyCol: String, rows: DataFrame, idCol: String, vecCol: String): Unit = {
    val (dels, upserts) = diffSplit(diff, keyCol, rows, idCol)
    deleteIds(spark, dir, dels, keyCol)
    appendBq(spark, dir, upserts, idCol, vecCol)
  }

  /** [[rebuildPq]] for the BQ layout. */
  def rebuildBq(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      dim: Int): Unit = {
    val tmp = dir + ".build-" + System.nanoTime()
    buildBq(corpus, idCol, vecCol, tmp, dim)
    graft.operators.Upsert.swapDirs(tmp, dir)
  }

  // --------------------------------------------------------- IVF × SQ8
  /** A loaded IVF×SQ index: coarse centroids + bounds in hand, byte
    * codes left ON DISK partitioned by coarse cluster. The practical
    * 100 TB retrieval layout: nprobe pruning cuts the scan to probed
    * cluster directories (parquet partition pruning, like IVF×PQ) while
    * SQ keeps the per-candidate error inside the analytic B(q) — unlike
    * PQ's codebook error, WHICH pairs are scored is the only
    * approximation axis nprobe adds (the full-probe gate pins exact
    * equality with the flat SQ scan).
    */
  final case class IvfSqIndex(coarse: DataFrame, bounds: Similarity.SqBounds,
      codesPath: String, nlist: Int, dir: String)

  /** Build + persist IVF×SQ: coarse centroids trained on a bounded
    * sample, exact SQ bounds, corpus assigned + encoded ONCE and written
    * partitioned by cluster.
    */
  def buildIvfSq(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      nlist: Int, iters: Int = 2, maxTrainRows: Int = 0,
      /** Already-trained coarse centroids — see [[buildIvf]].coarseIn. */
      coarseIn: Option[DataFrame] = None,
      /** Already-computed exact bounds — see [[buildSq]].boundsIn. */
      boundsIn: Option[Similarity.SqBounds] = None): Unit = {
    val spark = corpus.sparkSession
    writeMeta(spark, dir, m = 0, sub = 0, nlist = nlist, layout = "ivfsq")
    val coarse = coarseIn.getOrElse(
      Similarity.trainCentroids(corpus, idCol, vecCol, nlist,
        iters, maxTrainRows))
    coarse.write.mode("overwrite").parquet(s"$dir/coarse")
    val b = boundsIn.getOrElse(Similarity.sqTrainBounds(corpus, vecCol))
    writeBounds(spark, dir, b)
    val assigned = Similarity.assign(corpus, (idCol, vecCol), coarse)
      .select(qcol(idCol).cast("long").as("__id"), col("__cluster"))
    Similarity.sqEncode(corpus, idCol, vecCol, b)
      .join(assigned, Seq("__id"))
      .withColumn("__seq", lit(0L))
      .write.mode("overwrite").partitionBy("__cluster").parquet(s"$dir/codes")
  }

  def readIvfSq(spark: SparkSession, dir: String): IvfSqIndex = {
    val (_, _, nlist, _) = readMeta(spark, dir)
    IvfSqIndex(spark.read.parquet(s"$dir/coarse"), readBounds(spark, dir),
      s"$dir/codes", nlist, dir)
  }

  /** IVF×SQ top-k: probe clusters per query, scan ONLY the probed
    * cluster directories (partition pruning), score byte codes against
    * the broadcast per-query SQ frame. Same scale shape as [[ivfPqTopK]]:
    * nothing corpus-sized shuffles — the codes scan is pruned, probes and
    * query frames broadcast, and the only exchange feeds the top-k
    * window over scored candidates.
    *
    * `where` is FILTERED SEARCH ([[ivfTopK]]'s contract): evaluated
    * inside the pruned codes scan, pre-scoring — exact top-k of
    * probed ∩ predicate, never under-filled. SQ codes are one row per
    * id (`__id`, `__cluster`, `__codes`), so any per-row predicate over
    * those columns is safe.
    */
  def ivfSqTopK(spark: SparkSession, index: IvfSqIndex, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int,
      where: Column = lit(true)): DataFrame = {
    val q = queries.select(qcol(idCol).cast("long").as("query_id"),
      qcol(vecCol).as("__qv"))
    val probes = probeClusters(q, index.coarse, nprobe)
      .select(col("query_id"), col("__cluster"))
      .localCheckpoint(eager = true) // reused by the collect AND the join
    val probed = probes.select(col("__cluster")).distinct()
      .collect().map(_.getInt(0)) // ≤ nlist values by construction
    val codes = liveOnly(spark, index.dir,
      spark.read.parquet(index.codesPath)
        .filter(col("__cluster").isin(probed.map(Int.box): _*))
        .filter(where))
    val scored = codes
      .join(broadcast(probes), Seq("__cluster"))
      .filter(col("query_id") =!= col("__id"))
      .join(broadcast(Similarity.sqQueryFrame(queries, idCol, vecCol,
        index.bounds)), Seq("query_id"))
      .select(col("query_id"), col("__id").as("neighbor_id"),
        Similarity.sqScoreExpr.as("cosine_sq"))
    topKPerQuery(scored, "cosine_sq", "neighbor_id", k)
  }

  /** [[appendPq]] for the IVF×SQ layout: assign against the FROZEN
    * coarse centroids, encode against the FROZEN bounds, append into the
    * cluster partitions (same clamp caveat as [[appendSq]]).
    */
  def appendIvfSq(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val index = readIvfSq(spark, dir)
    val seq = nextSeq(spark, dir)
    val assigned = Similarity.assign(rows, (idCol, vecCol), index.coarse)
      .select(qcol(idCol).cast("long").as("__id"), col("__cluster"))
    Similarity.sqEncode(rows, idCol, vecCol, index.bounds)
      .join(assigned, Seq("__id"))
      .withColumn("__seq", lit(seq))
      .write.mode("append").partitionBy("__cluster").parquet(s"$dir/codes")
  }

  /** [[updatePq]] for the SQ layouts. */
  def updateSq(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    deleteIds(spark, dir, rows, idCol)
    appendSq(spark, dir, rows, idCol, vecCol)
  }

  def updateIvfSq(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    deleteIds(spark, dir, rows, idCol)
    appendIvfSq(spark, dir, rows, idCol, vecCol)
  }

  /** [[compactPq]] for the SQ layout: bounds carried frozen, live codes
    * rewritten, swap-published, tombstone log reset.
    */
  def compactSq(spark: SparkSession, dir: String): Unit = {
    require(readLayout(spark, dir) == "sq",
      s"$dir is not a flat SQ index — each layout has its own compaction")
    val tmp = dir + ".compact-" + System.nanoTime()
    val idx = readSq(spark, dir)
    // same refusal as the clustered layouts: compacting a fully-tombstoned
    // index to an empty codes table is a rebuild-or-drop decision, not a
    // compaction (the flat write keeps a schema file, but uniformity here
    // beats an index that silently becomes permanently empty)
    val live = requireLive(idx.codes, dir)
    writeMeta(spark, tmp, m = 0, sub = 0, nlist = -1, layout = "sq")
    spark.read.parquet(s"$dir/bounds")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/bounds")
    live.withColumn("__seq", lit(0L))
      .write.mode("overwrite").parquet(s"$tmp/codes")
    graft.operators.Upsert.swapDirs(tmp, dir)
  }

  /** [[compactSq]] for the IVF×SQ layout (clustered — [[requireLive]]
    * refuses the all-dead degenerate write like the other partitioned
    * layouts).
    */
  def compactIvfSq(spark: SparkSession, dir: String): Unit = {
    require(readLayout(spark, dir) == "ivfsq",
      s"$dir is not an IVF×SQ index — each layout has its own compaction")
    val tmp = dir + ".compact-" + System.nanoTime()
    val index = readIvfSq(spark, dir)
    val live = requireLive(
      liveOnly(spark, dir, spark.read.parquet(index.codesPath))
        .withColumn("__seq", lit(0L))
        .select(col("__id"), col("__codes"), col("__seq"), col("__cluster")), dir)
    writeMeta(spark, tmp, m = 0, sub = 0, nlist = index.nlist, layout = "ivfsq")
    index.coarse.write.mode("overwrite").parquet(s"$tmp/coarse")
    spark.read.parquet(s"$dir/bounds")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/bounds")
    live.write.partitionBy("__cluster").mode("overwrite").parquet(s"$tmp/codes")
    graft.operators.Upsert.swapDirs(tmp, dir)
  }

  /** [[applyDiffIvfPq]] for the SQ layouts. */
  def applyDiffSq(spark: SparkSession, dir: String, diff: DataFrame,
      keyCol: String, rows: DataFrame, idCol: String, vecCol: String): Unit = {
    val (dels, upserts) = diffSplit(diff, keyCol, rows, idCol)
    deleteIds(spark, dir, dels, keyCol)
    appendSq(spark, dir, upserts, idCol, vecCol)
  }

  def applyDiffIvfSq(spark: SparkSession, dir: String, diff: DataFrame,
      keyCol: String, rows: DataFrame, idCol: String, vecCol: String): Unit = {
    val (dels, upserts) = diffSplit(diff, keyCol, rows, idCol)
    deleteIds(spark, dir, dels, keyCol)
    appendIvfSq(spark, dir, upserts, idCol, vecCol)
  }

  /** [[rebuildPq]] for the IVF×SQ layout. */
  def rebuildIvfSq(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      nlist: Int, iters: Int = 2, maxTrainRows: Int = 0): Unit = {
    val tmp = dir + ".build-" + System.nanoTime()
    buildIvfSq(corpus, idCol, vecCol, tmp, nlist, iters, maxTrainRows)
    graft.operators.Upsert.swapDirs(tmp, dir)
  }

  // ------------------------------------------------------ atomic rebuild
  /** Atomic index REBUILD: the periodic retrain that resets append
    * drift. The new generation builds in a sibling temp directory, then
    * replaces `dir` through the two-move swap protocol the table
    * upserts already use ([[graft.operators.Upsert.swapDirs]]) — a
    * concurrent reader holds either the old generation or the new one,
    * never a half-written index (the plain builders' in-place overwrite
    * of meta/codebooks/codes is NOT safe under concurrent reads). The
    * swap also COMPACTS: tombstones and superseded code generations
    * vanish with the old directory. Maintenance writers must not race
    * the swap (object doc).
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

  // ------------------------------------------------------------ compaction
  /** Compact a flat-PQ index WITHOUT retraining: rewrite the codes table
    * to its live view (tombstoned and superseded generations physically
    * dropped, sequence numbers reset) and install the result through the
    * same two-move swap as [[rebuildPq]] — so readers never see a
    * half-compacted index and the tombstone log resets with the new
    * generation. Codebooks are carried over FROZEN: this is the cheap
    * delete-debt reclaim (one codes pass, no training, quantization
    * quality unchanged — exactly FAISS `remove_ids`' physical rewrite);
    * [[rebuildPq]] remains the quality reset. Serialize against other
    * maintenance like any rebuild (object doc).
    */
  def compactPq(spark: SparkSession, dir: String): Unit = {
    val layout = readLayout(spark, dir)
    require(layout == "pq",
      s"$dir is not a flat PQ index (layout=$layout) — each layout has its " +
        "own compaction; compacting with the wrong op would silently drop " +
        "the other layout's tables")
    val tmp = dir + ".compact-" + System.nanoTime()
    val live = readPq(spark, dir) // the live view, seq reset by writePq
    requireLive(live.codes, dir) // all-dead = rebuild-or-drop, same as compactSq
    writePq(live, tmp)
    graft.operators.Upsert.swapDirs(tmp, dir)
  }

  /** Refuse to compact a clustered layout down to ZERO live rows: an
    * empty `partitionBy` write emits no schema-bearing file (only
    * _SUCCESS), so the compacted table would throw on every later read
    * — strictly worse than the pre-compaction state, where a fully-
    * tombstoned index still serves (empty results). The degenerate
    * all-deleted case is a rebuild-or-drop decision, not a compaction;
    * fail loudly before any table is written. (The flat layouts'
    * unpartitioned empty write keeps a schema file, so they have no
    * unreadable-table hazard — they adopt the guard anyway so every
    * layout's compaction refuses the same degenerate state.)
    */
  private[ext] def requireLive(live: DataFrame, dir: String): DataFrame = {
    require(!live.isEmpty,
      s"refusing to compact $dir: every row is tombstoned — an empty " +
        "cluster-partitioned table is unreadable; rebuild or drop the index")
    live
  }

  /** [[compactPq]] for the IVF-flat layout: coarse centroids carried
    * frozen, live vectors rewritten into their cluster partitions.
    */
  def compactIvf(spark: SparkSession, dir: String): Unit = {
    require(readLayout(spark, dir) == "ivf",
      s"$dir is not an IVF-flat index — each layout has its own compaction")
    val tmp = dir + ".compact-" + System.nanoTime()
    val index = readIvf(spark, dir)
    val live = requireLive(
      liveOnly(spark, dir, spark.read.parquet(index.vectorsPath))
        .withColumn("__seq", lit(0L))
        .select(col("__id"), col("__vec"), col("__seq"), col("__cluster")), dir)
    writeMeta(spark, tmp, m = 0, sub = 0, index.nlist)
    index.coarse.write.mode("overwrite").parquet(s"$tmp/coarse")
    live.write.partitionBy("__cluster").mode("overwrite").parquet(s"$tmp/vectors")
    graft.operators.Upsert.swapDirs(tmp, dir)
  }

  /** [[compactPq]] for the IVF×PQ layout: coarse + codebooks carried
    * frozen, live codes (and refine vectors, when kept) rewritten into
    * their cluster partitions.
    */
  def compactIvfPq(spark: SparkSession, dir: String): Unit = {
    val (m, sub, nlist, residual) = readMeta(spark, dir)
    require(readLayout(spark, dir) == "ivfpq",
      s"$dir is not an IVF×PQ index — each layout has its own compaction")
    val tmp = dir + ".compact-" + System.nanoTime()
    val index = readIvfPq(spark, dir)
    val liveCodes = requireLive(
      liveOnly(spark, dir, spark.read.parquet(index.codesPath))
        .withColumn("__seq", lit(0L))
        .select(col("__id"), col("__j"), col("__code"), col("__seq"), col("__cluster")),
      dir)
    writeMeta(spark, tmp, m, sub, nlist, residual)
    index.coarse.write.mode("overwrite").parquet(s"$tmp/coarse")
    index.codebooks.write.mode("overwrite").parquet(s"$tmp/codebooks")
    liveCodes.write.partitionBy("__cluster").mode("overwrite").parquet(s"$tmp/codes")
    if (graft.util.Hfs.exists(spark, s"$dir/vectors"))
      // same tombstones govern both tables: codes non-empty ⇒ vectors too
      liveOnly(spark, dir, spark.read.parquet(s"$dir/vectors"))
        .withColumn("__seq", lit(0L))
        .select(col("__id"), col("__vec"), col("__seq"), col("__cluster"))
        .write.partitionBy("__cluster").mode("overwrite").parquet(s"$tmp/vectors")
    graft.operators.Upsert.swapDirs(tmp, dir)
  }

  // ------------------------------------------------------ tombstone debt
  /** Dead-row fraction of the index's primary table (codes, or vectors
    * for IVF-flat): rows superseded by a tombstone or a newer generation,
    * divided by all stored rows. 0.0 with no tombstone log (short-circuit
    * — nothing is scanned); otherwise one pass over the stored table
    * (column-pruned to id/seq) at MAINTENANCE time, which is where this
    * belongs — [[liveOnly]] keeps query paths an O(|deletes|) broadcast
    * join precisely so they never pay a debt measurement.
    *
    * Why measure at all: the tombstone broadcast and the dead rows
    * scanned-then-dropped on every query both grow with delete volume,
    * unbounded between rebuilds — debt is the number that says when the
    * cheap reclaim ([[compactPq]]/Ivf/IvfPq: one rewrite, codebooks
    * frozen) pays for itself.
    */
  def tombstoneDebt(spark: SparkSession, dir: String): Double = {
    val (total, live) = storeCounts(spark, dir)
    if (total == 0L) 0.0 else (total - live).toDouble / total
  }

  /** (total stored rows, live rows) of a layout's main table — the
    * integer numerators behind [[tombstoneDebt]] and [[healthReport]].
    * Rows are the table's PHYSICAL grain (exploded per subvector for
    * PQ-coded layouts): that is what every scan pays, which is what the
    * debt policy prices.
    */
  private def storeCounts(spark: SparkSession, dir: String): (Long, Long) = {
    val r = storeCountsDf(spark, dir).head()
    (r.getLong(0), r.getLong(1))
  }

  /** [[storeCounts]] as a LAZY one-row (`__total`, `__live`) frame — the
    * building block that lets fleet dashboards ([[healthReport]], the
    * sweep/fsck callers) assemble ONE plan over every store instead of
    * serializing a blocking counter job per store: a fleet over a dozen
    * tiny stores was paying seconds of pure per-job scheduling floor
    * (r21 baseline: x_index_health 118 stages / 3.1 s wall at 1.3 cpu-s).
    * The eager tuple form above keeps the policy callers' contract.
    */
  private def storeCountsDf(spark: SparkSession, dir: String): DataFrame = {
    // composed layouts keep their tables AND tombstones in the nested
    // index (deletes delegate) — route to the table-owning level the
    // same way liveIds/compactIfNeeded do, so healthReport/sweep/fsck
    // on a composed ROOT measure the store that actually serves
    val owner = readLayout(spark, dir) match {
      case "pcapq" | "opq" => s"$dir/pq"
      case "opqivfpq"      => s"$dir/ivfpq"
      case _               => dir
    }
    val ownerLayout = readLayout(spark, owner) // one meta read, reused
    val table = ownerLayout match {
      // vector-table layouts (IVF-flat, graph) have no codes table
      case "ivf" | "graph" => s"$owner/vectors"
      case _               => s"$owner/codes"
    }
    val main = tableCountsDf(spark, owner, table)
    // a graph store's fresh region ([[GraphAnn.append]]) is part of the
    // served set — debt/health that ignored it would under-price the
    // store the sweep maintains
    if (ownerLayout == "graph" &&
        graft.util.Hfs.exists(spark, s"$owner/delta")) {
      val d = tableCountsDf(spark, owner, s"$owner/delta")
        .select(col("__total").as("__dt"), col("__live").as("__dl"))
      main.crossJoin(d) // 1×1: counter rows, never data
        .select((col("__total") + col("__dt")).as("__total"),
          (col("__live") + col("__dl")).as("__live"))
    } else main
  }

  /** [[storeCounts]] with the main table named explicitly — shared with
    * the non-ANN tombstone consumers (the text-index layouts), whose
    * main table lives at a layout-specific path but whose tombstone
    * discipline is this one.
    */
  private[ext] def tableCounts(spark: SparkSession, dir: String,
      table: String): (Long, Long) = {
    val r = tableCountsDf(spark, dir, table).head()
    (r.getLong(0), r.getLong(1))
  }

  /** [[tableCounts]] as a lazy one-row (`__total`, `__live`) frame — see
    * [[storeCountsDf]] for why the lazy form exists.
    */
  private[ext] def tableCountsDf(spark: SparkSession, dir: String,
      table: String): DataFrame = {
    readTombstones(spark, dir) match {
      case None =>
        spark.read.parquet(table).agg(count(lit(1)).as("__total"))
          .select(col("__total"), col("__total").as("__live"))
      case Some(t) =>
        // total and live counted in ONE pass over the (id, seq)-pruned
        // table: the same per-id-max tombstone broadcast as liveOnly,
        // with the liveness predicate under a conditional count instead
        // of a second scan
        val dead = t.groupBy(col("__id")).agg(max(col("__seq")).as("__tseq"))
        // pre-tombstone-layout tables have no __seq column (liveOnly
        // reads them as seq 0); mirror that here instead of throwing
        val stored = spark.read.parquet(table)
        val seqCol =
          if (stored.columns.contains("__seq")) col("__seq") else lit(0L)
        stored.select(col("__id"), seqCol.as("__seq"))
          .join(broadcast(dead), Seq("__id"), "left")
          .agg(count(lit(1)).as("__total"),
            count(when(col("__tseq").isNull ||
              coalesce(col("__seq"), lit(0L)) > col("__tseq"), 1)).as("__live"))
    }
  }

  /** Store-health dashboard over a set of index layouts: per layout the
    * physical row count, the live count under tombstone semantics, and
    * the tombstone debt [[compactIfNeeded]] prices — the maintenance
    * number an index fleet tracks per store per day. All-integer
    * numerators plus one division, so the report reproduces bit-for-bit
    * (hash-matchable against a replay over the stored tables). Each
    * layout costs one metadata-light scan; nothing corpus-sized moves.
    * PCA-PQ callers pass the nested `dir/pq` (the table-owning level,
    * same as its maintenance entry points).
    */
  def healthReport(spark: SparkSession, layouts: Seq[(String, String)]): DataFrame = {
    require(layouts.nonEmpty, "no layouts to report")
    // per-store measurement runs CONCURRENTLY (thread-pooled submission,
    // jobs interleave; results identical — independent deterministic
    // counters), each store now ONE job over its lazy counter frame:
    // [[storeCountsDf]] folds what used to be up to two blocking counts
    // (main + graph delta) into a single aggregate. A single giant lazy
    // union was A/B-measured 2.8× SLOWER here (r21): AQE materializes
    // every branch's exchange as its own sequential scheduling round, so
    // the union pays the same per-store round trips PLUS a 15-branch
    // optimizer problem — concurrency must come from submission threads.
    graft.util.Par.all(8)(layouts.map { case (name, dir) => () =>
      storeCountsDf(spark, dir).select(lit(name).as("layout"),
        col("__total").as("total_rows"), col("__live").as("live_rows"),
        (col("__total") - col("__live")).as("dead_rows"),
        when(col("__total") === 0L, lit(0.0))
          .otherwise((col("__total") - col("__live")).cast("double") /
            col("__total"))
          .as("tombstone_debt"))
        .localCheckpoint(eager = true)
    }).reduce(_ unionByName _)
  }

  /** The compaction POLICY: measure [[tombstoneDebt]] and, at or above
    * `threshold`, route to the layout's compaction; returns whether a
    * compaction ran. The 0.25 default reclaims when a quarter of every
    * scan is dead weight — well before typical delete volumes threaten
    * broadcast limits — while letting steady low-rate deletes accumulate
    * into one rewrite instead of many. Call it on the maintenance cadence
    * (after applyDiff batches, before serving windows). The degenerate
    * fully-tombstoned clustered index still refuses to compact
    * ([[requireLive]]) — that state is a rebuild-or-drop decision, and
    * this policy propagates the loud error rather than masking it.
    */
  def compactIfNeeded(spark: SparkSession, dir: String,
      threshold: Double = 0.25): Boolean = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1]: $threshold")
    // a graph store's FRESH REGION is a second debt axis: every query
    // brute-scores the whole delta, so the policy folds it once its
    // share of the store crosses the same threshold — without this, a
    // pure-append workload (zero tombstones, debt 0) would grow the
    // delta unboundedly, and live delta rows in the denominator would
    // even DILUTE tombstone debt away from the trigger. One row count
    // of the (append-batch-file-sized) delta when present.
    val deltaDebt =
      if (readLayout(spark, dir) == "graph" &&
          graft.util.Hfs.exists(spark, s"$dir/delta")) {
        val d = spark.read.parquet(s"$dir/delta").count()
        val (total, _) = storeCounts(spark, dir)
        if (total == 0L) 0.0 else d.toDouble / total
      } else 0.0
    if (tombstoneDebt(spark, dir) < threshold && deltaDebt < threshold)
      false
    else {
      readLayout(spark, dir) match {
        case "pq"    => compactPq(spark, dir)
        case "ivf"   => compactIvf(spark, dir)
        case "ivfpq" => compactIvfPq(spark, dir)
        case "sq"    => compactSq(spark, dir)
        case "ivfsq" => compactIvfSq(spark, dir)
        case "bq"    => compactBq(spark, dir)
        // pcapq keeps its tombstones in the nested dir/pq (deletes
        // delegate), so debt at the OUTER dir is structurally 0 — the
        // route exists so a future outer-level tombstone writer cannot
        // turn a compaction request into an unknown-layout error
        case "pcapq" => compactPcaPq(spark, dir)
        case "opq"   => compactPq(spark, s"$dir/pq")
        case "opqivfpq" => compactIvfPq(spark, s"$dir/ivfpq")
        case "graph" => GraphAnn.compact(spark, dir)
        case other => throw new IllegalStateException(
          s"$dir has unknown index layout '$other'")
      }
      true
    }
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
    * append in between. Caller owns id uniqueness across appends and
    * must serialize maintenance against rebuilds of the same index
    * (object doc).
    *
    * Re-adding an id that is already live MUST go through [[updatePq]] /
    * [[updateIvfPq]] (tombstone + re-append), NEVER a bare append:
    * liveness only subtracts TOMBSTONED generations ([[liveOnly]]), so a
    * duplicate append leaves two live generations of the id — the raw
    * ADC sum then double-counts its per-subspace partials (a corrupt,
    * inflated score) and the residual path emits duplicate neighbor
    * rows. Guarding this inside append would cost a corpus semi-join per
    * batch; FAISS `add_with_ids` makes the same caller-owns-it trade.
    */
  def appendPq(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val model = readPq(spark, dir)
    val seq = nextSeq(spark, dir)
    Similarity.pqEncode(rows, idCol, vecCol, model.centroids, model.m, model.sub)
      .withColumn("__seq", lit(seq))
      .write.mode("append").parquet(s"$dir/codes")
  }

  /** [[appendPq]] for the IVF-flat layout: assign against the frozen
    * coarse centroids, append into the cluster partitions.
    */
  def appendIvf(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val index = readIvf(spark, dir)
    val seq = nextSeq(spark, dir)
    Similarity.assign(rows, (idCol, vecCol), index.coarse)
      .select(qcol(idCol).cast("long").as("__id"), qcol(vecCol).as("__vec"),
        lit(seq).as("__seq"), col("__cluster"))
      .write.mode("append").partitionBy("__cluster").parquet(index.vectorsPath)
  }

  /** [[appendPq]] for the IVF×PQ layout: frozen coarse quantizer AND
    * frozen codebooks; one assign + one encode of the new rows, appended
    * into the cluster partitions. An index built with `keepVectors` also
    * gets the rows' exact vectors appended, so the refine path stays
    * complete.
    */
  def appendIvfPq(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val (codes, vectors) = ivfPqAppendFrames(spark, dir, rows, idCol, vecCol)
    codes.write.mode("append").partitionBy("__cluster").parquet(s"$dir/codes")
    vectors.foreach(_.write.mode("append").partitionBy("__cluster")
      .parquet(s"$dir/vectors"))
  }

  /** The encode half of [[appendIvfPq]] without the writes: (codes frame,
    * vectors frame when the index keeps refine vectors), both already in
    * their on-disk column shape with the append's `__seq` attached. The
    * streaming append stages these under a per-batch generation and
    * publishes atomically ([[graft.streaming.DocStreams.runIvfPqAppendOnce]]);
    * the batch form above just appends them in place.
    */
  private[graft] def ivfPqAppendFrames(spark: SparkSession, dir: String,
      rows: DataFrame, idCol: String, vecCol: String): (DataFrame, Option[DataFrame]) =
    ivfPqAppendFrames(spark, dir, ivfPqAppendContext(spark, dir), rows, idCol, vecCol)

  /** The per-run constants of a frozen-quantizer append stream: the
    * loaded index with its small quantizer tables CHECKPOINTED (per-batch
    * encodes then read blocks, not parquet) and the refine-vectors flag.
    * A maintenance stream loads this once instead of re-reading
    * meta/coarse/codebooks every micro-batch; sound because maintenance
    * ops are serialized against the stream by the caller contract
    * (object doc), so nothing the context caches can change mid-run.
    * The sequence number is deliberately NOT hoisted: it is one sidecar
    * file read per batch ([[nextSeq]]), and re-reading it keeps a
    * contract-violating mid-stream delete merely forbidden rather than
    * silently row-losing (a hoisted seq would stamp a later re-append
    * BELOW the intervening tombstone and the update would vanish).
    */
  private[graft] final case class AppendContext(index: IvfPqIndex,
      keepVectors: Boolean)

  private[graft] def ivfPqAppendContext(spark: SparkSession,
      dir: String): AppendContext = {
    val idx = readIvfPq(spark, dir)
    AppendContext(
      idx.copy(coarse = idx.coarse.localCheckpoint(eager = true),
        codebooks = idx.codebooks.localCheckpoint(eager = true)),
      graft.util.Hfs.exists(spark, s"$dir/vectors"))
  }

  private[graft] def ivfPqAppendFrames(spark: SparkSession, dir: String,
      ctx: AppendContext,
      rows: DataFrame, idCol: String, vecCol: String): (DataFrame, Option[DataFrame]) = {
    val index = ctx.index
    val seq = nextSeq(spark, dir)
    val assigned = Similarity.assign(rows, (idCol, vecCol), index.coarse)
    // a residual index's frozen model quantizes coarse-centroid
    // residuals, not raw vectors — appending raw-encoded codes would
    // silently mix the two score spaces inside one codes table
    val codes = (if (index.residual)
        Similarity.pqResidualEncode(assigned, idCol, vecCol, index.coarse,
          index.codebooks, index.m, index.sub)
      else
        Similarity.pqEncode(rows, idCol, vecCol, index.codebooks,
            index.m, index.sub)
          .join(assigned.select(qcol(idCol).cast("long").as("__id"),
            col("__cluster")), Seq("__id"))
      ).withColumn("__seq", lit(seq))
    val vectors =
      if (ctx.keepVectors)
        Some(assigned
          .select(qcol(idCol).cast("long").as("__id"), qcol(vecCol).as("__vec"),
            lit(seq).as("__seq"), col("__cluster")))
      else None
    (codes, vectors)
  }

  // ------------------------------------------------------ delete / update
  /** Update (re-embed) existing rows in a persisted flat-PQ index:
    * tombstone the old generation, then re-encode the new rows against
    * the frozen codebooks — the delete's sequence number supersedes the
    * old code rows and the re-append lands one past it, so exactly the
    * new encoding is live (FAISS has no in-place update either;
    * remove_ids + add is the documented recipe). Rows whose id was never
    * indexed insert cleanly (their tombstone kills nothing).
    */
  def updatePq(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    deleteIds(spark, dir, rows, idCol)
    appendPq(spark, dir, rows, idCol, vecCol)
  }

  /** [[updatePq]] for the IVF-flat layout. */
  def updateIvf(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    deleteIds(spark, dir, rows, idCol)
    appendIvf(spark, dir, rows, idCol, vecCol)
  }

  /** [[updatePq]] for the IVF×PQ layout. A re-embedded row may move to a
    * DIFFERENT coarse cluster; the old cluster's stale codes are dead via
    * the tombstone, so partition pruning stays correct.
    */
  def updateIvfPq(spark: SparkSession, dir: String, rows: DataFrame,
      idCol: String, vecCol: String): Unit = {
    deleteIds(spark, dir, rows, idCol)
    appendIvfPq(spark, dir, rows, idCol, vecCol)
  }

  /** Split a [[graft.operators.Upsert.snapshotDiff]] CDC frame (`change`
    * ∈ insert/update/delete + the key column) into the two maintenance
    * inputs every layout shares: keys to tombstone (deletes AND updates
    * — the update's re-append supersedes), and the `rows` slice carrying
    * the new embeddings for insert/update keys.
    */
  private def diffSplit(diff: DataFrame, keyCol: String, rows: DataFrame,
      idCol: String): (DataFrame, DataFrame) = {
    val dels = diff.filter(col("change").isin("delete", "update"))
      .select(qcol(keyCol).as(keyCol))
    val upserts = rows.join(
      diff.filter(col("change").isin("insert", "update"))
        .select(qcol(keyCol).cast("long").as("__uid")),
      qcol(idCol).cast("long") === col("__uid"), "left_semi")
    (dels, upserts)
  }

  /** Apply a snapshotDiff CDC frame to a persisted IVF×PQ index — the
    * snapshotDiff → index maintenance loop: deletes tombstone, updates
    * tombstone + re-encode, inserts append. `rows` must carry the new
    * embeddings for the insert/update keys.
    */
  def applyDiffIvfPq(spark: SparkSession, dir: String, diff: DataFrame,
      keyCol: String, rows: DataFrame, idCol: String, vecCol: String): Unit = {
    val (dels, upserts) = diffSplit(diff, keyCol, rows, idCol)
    deleteIds(spark, dir, dels, keyCol)
    appendIvfPq(spark, dir, upserts, idCol, vecCol)
  }

  /** [[applyDiffIvfPq]] for the flat-PQ layout. */
  def applyDiffPq(spark: SparkSession, dir: String, diff: DataFrame,
      keyCol: String, rows: DataFrame, idCol: String, vecCol: String): Unit = {
    val (dels, upserts) = diffSplit(diff, keyCol, rows, idCol)
    deleteIds(spark, dir, dels, keyCol)
    appendPq(spark, dir, upserts, idCol, vecCol)
  }

  /** [[applyDiffIvfPq]] for the IVF-flat layout. */
  def applyDiffIvf(spark: SparkSession, dir: String, diff: DataFrame,
      keyCol: String, rows: DataFrame, idCol: String, vecCol: String): Unit = {
    val (dels, upserts) = diffSplit(diff, keyCol, rows, idCol)
    deleteIds(spark, dir, dels, keyCol)
    appendIvf(spark, dir, upserts, idCol, vecCol)
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

  // --------------------------------------------------- recall reporting
  /** Measured serving-quality report: recall@k and rank agreement of
    * each served ANN layout against a reference (brute-force) top-k, at
    * the layouts' OPERATING parameters — the number a production vector
    * -store dashboard tracks per index build (the mechanics gates prove
    * full-probe == brute; this measures what the approximation actually
    * costs at the nprobe/shortlist a user runs).
    *
    * `results` are (layout name, served top-k frame) pairs and
    * `reference` the exact top-k, all in the standard ranked shape
    * (`query_id`, `rank`, `neighbor_id`, score) that every topK
    * operator here emits; rows with rank > k are ignored so callers can
    * pass wider frames.
    *
    * Metrics are INTEGER-NUMERATOR by design (the hash-match
    * discipline): `hits` = |served ∩ reference| and `rank_footrule` =
    * Σ |rank_served − rank_ref| over the intersection (Spearman's
    * footrule restricted to shared neighbors — 0 iff the shared lists
    * agree in order) are exact counts, and `recall_at_k` = hits /
    * possible is ONE IEEE division of those counts, so the whole row
    * reproduces bit-for-bit in any engine.
    *
    * Scale shape: per layout one (query_id, neighbor_id)-keyed join of
    * two (n_queries × k)-sized frames plus a scalar aggregate — nothing
    * corpus-sized; the report costs less than any single search it
    * measures.
    *
    * Output: (`layout`, `k`, `n_queries`, `possible`, `hits`,
    * `recall_at_k`, `rank_footrule`), one row per layout in input order.
    */
  /** Measured recall@k of the served IVF×PQ path against the index's
    * OWN live exact vectors (requires a `keepVectors = true` build) —
    * the counter pair a recall monitor logs: (hits, possible). Integer
    * counts from the ranked-list join, so the measurement replays
    * exactly. One brute pass over the live vectors + one pruned serve.
    */
  def ivfPqRecallCounters(spark: SparkSession, dir: String,
      queries: DataFrame, idCol: String, vecCol: String, k: Int,
      nprobe: Int): (Long, Long) = {
    require(graft.util.Hfs.exists(spark, s"$dir/vectors"),
      s"$dir has no vectors/ table — build with keepVectors = true " +
        "to enable recall measurement")
    val index = readIvfPq(spark, dir)
    val live = liveOnly(spark, dir, spark.read.parquet(s"$dir/vectors"))
      .select(col("__id").as(idCol), col("__vec").as(vecCol))
    val q = queries.select(qcol(idCol), qcol(vecCol))
      .localCheckpoint(eager = true) // feeds reference AND serve
    val ref = Similarity.bruteForceTopK(q, live, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(eager = true)
    val served = ivfPqTopK(spark, index, q, idCol, vecCol, k, nprobe)
    val hits = served.select(col("query_id"), col("neighbor_id"))
      .join(ref, Seq("query_id", "neighbor_id"), "left_semi").count()
    (hits, ref.count())
  }

  /** Operating-point selection for the served IVF index (the FAISS
    * autotune shape): measure recall@k against the index's OWN live
    * exact vectors for each candidate nprobe — ascending — and choose
    * the SMALLEST candidate meeting the target, falling back to the
    * largest when none does. This is the knob a serving deployment sets
    * once per rebuild: the report row per candidate keeps the whole
    * curve auditable, `chosen` marks the operating point.
    *
    * Deterministic end to end: hit counts are integers (the ranked-list
    * join), recall quantizes to fixed point (floor ×1e6), and the
    * target compares as an integer — so the selection replays exactly
    * in SQL. `targetRecallQ` is the ×1e6 fixed-point target (950000 =
    * 0.95). Cost: one brute-force pass over the live vectors (the
    * reference — queries-sized × corpus, the honest price of measuring
    * recall) plus one pruned serve per candidate.
    */
  def autotuneNprobe(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, targetRecallQ: Long,
      candidates: Seq[Int]): DataFrame = {
    require(candidates.nonEmpty && candidates == candidates.sorted &&
      candidates.distinct == candidates,
      s"candidates must be ascending and distinct: $candidates")
    require(targetRecallQ >= 0L && targetRecallQ <= 1000000L,
      s"targetRecallQ out of [0, 1e6]: $targetRecallQ")
    val index = readIvf(spark, dir)
    val live = liveOnly(spark, dir, spark.read.parquet(index.vectorsPath))
      .select(col("__id").as(idCol), col("__vec").as(vecCol))
    val q = queries.select(qcol(idCol), qcol(vecCol))
      .localCheckpoint(eager = true) // reused per candidate
    val ref = Similarity.bruteForceTopK(q, live, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(eager = true)
    val possible = ref.count()
    // the per-candidate serve+count probes are independent deterministic
    // plans — run them CONCURRENTLY (the Par fleet discipline) instead
    // of serializing one blocking count job per candidate; the sweep's
    // wall tracks the slowest candidate, results are identical
    val rows = graft.util.Par.all(candidates.size)(candidates.map { np => () =>
      val served = ivfTopK(spark, index, q, idCol, vecCol, k, np)
      val hits = served.select(col("query_id"), col("neighbor_id"))
        .join(ref, Seq("query_id", "neighbor_id"), "left_semi").count()
      val recallQ =
        if (possible == 0L) 0L
        else math.floor(hits.toDouble / possible * 1e6).toLong
      (np, hits, recallQ, recallQ >= targetRecallQ)
    })
    val chosen = rows.find(_._4).map(_._1).getOrElse(candidates.max)
    rows.map { case (np, hits, recallQ, meets) =>
      spark.range(1).select(lit(np).as("nprobe"), lit(hits).as("hits"),
        lit(possible).as("possible"), lit(recallQ).as("recall_q"),
        lit(meets).as("meets"), lit(np == chosen).as("chosen"))
    }.reduce(_ unionByName _)
  }

  def recallReport(results: Seq[(String, DataFrame)], reference: DataFrame,
      k: Int): DataFrame = {
    require(results.nonEmpty, "no layouts to report")
    require(k > 0, s"k must be positive: $k")
    val ref = reference.filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("__rref"))
      .localCheckpoint(eager = true) // joined once per layout
    val totals = ref.agg(count(lit(1)).as("__possible"),
      countDistinct(col("query_id")).as("__nq"))
    results.map { case (name, served) =>
      served.filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("rank").as("__rsrv"))
        .join(ref, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("hits"),
          coalesce(sum(abs(col("__rsrv") - col("__rref"))), lit(0L))
            .as("rank_footrule"))
        .crossJoin(broadcast(totals))
        .select(lit(name).as("layout"), lit(k).as("k"),
          col("__nq").as("n_queries"), col("__possible").as("possible"),
          col("hits"),
          // an empty reference must report recall 0.0, not 0/0 = NaN
          when(col("__possible") === 0L, lit(0.0))
            .otherwise(col("hits").cast("double") / col("__possible"))
            .as("recall_at_k"),
          col("rank_footrule"))
    }.reduce(_ unionByName _)
  }
}
