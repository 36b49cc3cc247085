package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Streaming document pipelines: the incremental forms of the batch
  * dedup operators, against a PERSISTED state store (the streaming
  * analog of [[graft.ext.AnnIndex]]'s append maintenance — new documents
  * arrive forever; re-sketching the whole corpus per batch would be a
  * corpus-sized pass per micro-batch).
  */
object DocStreams {

  /** Incremental MinHash near-duplicate detection over a document
    * stream: each micro-batch is sketched ONCE (signatures + LSH band
    * keys), joined against the persisted signature store for
    * old↔new candidates, self-joined for new↔new ones, and appended
    * into the store — so every batch's work scales with the BATCH (plus
    * one store-side scan of the banded table, which a production
    * deployment prunes by partitioning the store on `__band`), never
    * with corpus². Candidate semantics match [[Dedup.minhashCandidates]]
    * run on everything seen so far: a pair (a, b) surfaces exactly once,
    * in the batch where its LATER member arrives, with the same
    * signature-estimated jaccard — the `x_stream_dedup_minhash` gate
    * pins streamed == one-shot batch on the union.
    *
    * The hot-bucket cap is evaluated AT ARRIVAL TIME over the store ∪
    * batch: a bucket that only later turns hot keeps the pairs it
    * emitted while small (the streaming-natural reading; the batch form
    * judges buckets once, globally). Ids must be unique across the
    * stream (same discipline as the index appends); foreachBatch is
    * at-least-once, so the returned frame dedups pairs on read.
    *
    * `storeDir` is deleted first: the run IS the store's history.
    * Layout under `storeDir`: `sigs/` (banded signatures, one row per
    * (id, band)) and `pairs/` (emitted candidates).
    */
  def runMinhashDedupOnce(
      spark: SparkSession,
      spoolDir: String,
      storeDir: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 3,
      minEstJaccard: Double = 0.5,
      maxBucketSize: Int = 1000,
  ): DataFrame = {
    // fail before the stream starts, not inside the first foreachBatch
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    graft.util.Hfs.delete(spark, storeDir)
    val sigsPath = s"$storeDir/sigs"
    val pairsPath = s"$storeDir/pairs"
    // per-batch joins are batch×store-sized; the session-wide analytics
    // shuffle width just multiplies task overhead across micro-batches
    // (same knob as runUpsertOnce)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val stream = spark.readStream
        .schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(spoolDir)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val bandedNew = Dedup.minhashBanded(
              Dedup.minhashSignatures(batch.toDF(), "doc_id", "text",
                numHashes, shingleSize),
              numHashes, bands)
            .localCheckpoint(eager = true) // counts + 2 join sides + append
          // only buckets the BATCH touches can produce pairs this batch:
          // prune the store scan to them up front (broadcast semi-join on
          // the batch's ≤ batch×bands keys) so neither the bucket sizing
          // nor the candidate join ever aggregates the whole store
          val newKeys = bandedNew.select(col("__band"), col("__bh")).distinct()
          val store =
            if (graft.util.Hfs.exists(spark, sigsPath))
              Some(spark.read.parquet(sigsPath)
                .join(broadcast(newKeys), Seq("__band", "__bh"), "left_semi")
                .localCheckpoint(eager = true)) // counts + the cross join
            else None
          // at-arrival bucket sizing over (pruned) store ∪ batch
          val all = store.map(_.unionByName(bandedNew)).getOrElse(bandedNew)
          val okBuckets = all.groupBy(col("__band"), col("__bh"))
            .agg(count(lit(1)).as("__bn"))
            .filter(col("__bn") <= maxBucketSize && col("__bn") > 1)
            .select(col("__band"), col("__bh"))
          val newSide = bandedNew.join(okBuckets, Seq("__band", "__bh"), "left_semi")
          // new↔new inside the batch: plain banded self-join, a < b
          val a = newSide.select(col("__band"), col("__bh"),
            col("__id").as("id_a"), col("__sig").as("__sa"))
          val b = newSide.select(col("__band"), col("__bh"),
            col("__id").as("id_b"), col("__sig").as("__sb"))
          val newNew = a.join(b, Seq("__band", "__bh"))
            .filter(col("id_a") < col("id_b"))
            .select(col("id_a"), col("id_b"), col("__sa"), col("__sb"))
          // old↔new: the batch side is micro-batch-sized — broadcast it
          // into the store scan so the store never shuffles
          val newOld = store.map { st =>
            st.join(okBuckets, Seq("__band", "__bh"), "left_semi")
              .select(col("__band"), col("__bh"),
                col("__id").as("__oid"), col("__sig").as("__osig"))
              .join(broadcast(newSide
                .select(col("__band"), col("__bh"),
                  col("__id").as("__nid"), col("__sig").as("__nsig"))),
                Seq("__band", "__bh"))
              // under at-least-once redelivery a batch can meet its OWN
              // already-stored signatures — a (id, id) self-pair with
              // est_jaccard 1.0 would survive the read-side pair dedup
              .filter(col("__oid") =!= col("__nid"))
              .select(least(col("__oid"), col("__nid")).as("id_a"),
                greatest(col("__oid"), col("__nid")).as("id_b"),
                col("__osig").as("__sa"), col("__nsig").as("__sb"))
          }
          val pairs = newOld.map(newNew.unionByName(_)).getOrElse(newNew)
            .select(col("id_a"), col("id_b"),
              Dedup.estJaccard(col("__sa"), col("__sb"), numHashes).as("est_jaccard"))
            .filter(col("est_jaccard") >= minEstJaccard)
            .groupBy(col("id_a"), col("id_b"))
            .agg(round(first(col("est_jaccard")), 4).as("est_jaccard"))
          pairs.write.mode("append").parquet(pairsPath)
          bandedNew.write.mode("append").parquet(sigsPath)
          spark.catalog.refreshByPath(sigsPath)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    if (graft.util.Hfs.exists(spark, pairsPath))
      spark.read.parquet(pairsPath)
        // idempotent under micro-batch replays: one row per pair
        .groupBy(col("id_a"), col("id_b"))
        .agg(first(col("est_jaccard")).as("est_jaccard"))
    else {
      import spark.implicits._
      Seq.empty[(Long, Long, Double)].toDF("id_a", "id_b", "est_jaccard")
    }
  }

  /** Streaming ANN index maintenance: embedding batches arriving on a
    * spool are appended into a persisted IVF×PQ index
    * ([[graft.ext.AnnIndex.appendIvfPq]]) one micro-batch at a time —
    * the index-side half of a streaming ingestion pipeline (the table
    * side is `EventStreams.runUpsertOnce`). Quantizers stay FROZEN, so
    * the post-stream index equals a one-shot encode of everything ever
    * appended (the `x_stream_knn_append` gate pins it); stream enough
    * drift and you rebuild on your cadence, exactly as in batch. The
    * caller owns the index's existence (build it on the base corpus
    * first), id uniqueness across the stream, and not racing a rebuild
    * (AnnIndex object doc). The spool columns must be
    * (`idCol` long, `vecCol` array&lt;float&gt;) — the parameters name
    * the columns, not their types.
    *
    * Replay discipline: foreachBatch is at-least-once, and a parquet
    * append is not idempotent — a re-delivered batch would append a
    * second code generation at the same sequence number, and the ADC
    * sum would double those ids' scores. Each appended batch therefore
    * leaves a `_batch_<id>` marker in the index dir and re-deliveries
    * of a marked batch are SKIPPED. The marker lands after the append,
    * so a crash inside the append itself can still replay into a
    * double-append — the same crash window as any non-transactional
    * sink; an exactly-once deployment puts the append behind its own
    * transactional table, or rebuilds on recovery.
    */
  def runIvfPqAppendOnce(
      spark: SparkSession,
      spoolDir: String,
      indexDir: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): Unit = {
    require(new java.io.File(s"$indexDir/meta").exists(),
      s"$indexDir is not a built IVF×PQ index — build on the base corpus first")
    // fail on the wrong layout BEFORE the stream starts (a flat-PQ dir
    // would otherwise die inside the first batch, wrapped in a
    // StreamingQueryException)
    val meta = spark.read.parquet(s"$indexDir/meta").head()
    require(meta.getAs[Int]("nlist") > 0 && meta.getAs[Int]("m") > 0,
      s"$indexDir is not an IVF×PQ index (m=${meta.getAs[Int]("m")}, " +
        s"nlist=${meta.getAs[Int]("nlist")})")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val stream = spark.readStream
        .schema(s"$idCol long, $vecCol array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(spoolDir)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          val marker = new java.io.File(indexDir, s"_batch_$batchId")
          if (!marker.exists()) {
            graft.ext.AnnIndex.appendIvfPq(spark, indexDir, batch.toDF(), idCol, vecCol)
            marker.createNewFile()
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
