package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Cols.qcol

/** Margin-based parallel-pair mining — the ratio-margin method parallel
  * corpora are mined with at web scale (Artetxe & Schwenk 2019's
  * margin-based scoring, the LASER/CCMatrix recipe): a candidate pair
  * (x, y) scores by its cosine RELATIVE to each side's neighborhood
  * density,
  *
  *   margin(x, y) = cos(x, y) / ((avgNNk(x) + avgNNk(y)) / 2),
  *
  * where avgNNk is the mean cosine of the side's k nearest neighbors in
  * the OTHER set — hub vectors that are near everything score near 1 and
  * drop out, isolated true pairs score high. Mined pairs are the MUTUAL
  * best: y is x's margin-argmax among x's forward top-k AND x is y's
  * margin-argmax among y's backward top-k, with margin above the
  * threshold.
  *
  * Engine portability: cosines are quantized to exact integers on the
  * family's 4dp ranking grid (`round(c,4)·10⁴` as BIGINT), neighborhood
  * sums reduce as integers (order-free), and the margin itself is ONE
  * integer division — floor(cq · 2·|Nx|·|Ny| · 10⁶ / (Σx·|Ny| + Σy·|Nx|))
  * — so the mined set and its `margin_q` column replay bit-for-bit in a
  * second engine (the x_mine_bitext gate hash-pins them).
  *
  * Scale shape: the core consumes any (query_id, rank, neighbor_id,
  * cosine) top-k frames. [[mineParallelPairs]] feeds it the brute-force
  * legs (gate scale, oracle-replayable); [[mineParallelPairsIvf]] feeds
  * it the persisted IVF indexes' nprobe-pruned serving — at 100 TB each
  * side's kNN is the index scan the ANN family already prices, and the
  * margin/mutual epilogue is two counter-sized aggregations plus two
  * windows over (queries × k) rows, never corpus-sized.
  */
object Mining {

  /** Quantize the family's 4dp-rounded cosine onto an exact integer
    * grid: round(c·10⁴) as BIGINT (multiplying first avoids the
    * rounded-double×10⁴ representation error, e.g. 0.1234·10⁴ =
    * 1233.999…).
    */
  private def cosQ(c: Column): Column = round(c * 10000, 0).cast("long")

  /** The kNN legs' `query_id =!= neighbor_id` rule is a SINGLE-corpus
    * self-match exclusion — across two DISTINCT corpora it would
    * silently drop exactly the pairs bitext mining exists to find
    * (aligned corpora are typically both indexed 0..n−1, so the true
    * pair IS (i, i)). Query-side ids are therefore offset into a
    * disjoint namespace before every leg and mapped back after; ids
    * must stay below 2⁶¹ (they share the family's long id contract).
    */
  private val IdOffset = 1L << 61

  /** The margin + mutual-best epilogue over pre-computed top-k frames
    * (both in the family's (query_id, rank, neighbor_id, cosine)
    * contract; `fwd` ranks X against Y, `bwd` ranks Y against X).
    * Exposed so every kNN backend — brute, IVF, any future layout —
    * mines through identical arithmetic.
    */
  private[ext] def minedFromTopK(fwd: DataFrame, bwd: DataFrame,
      marginThresholdQ: Long): DataFrame = {
    // each leg feeds three consumers (its neighborhood aggregate and
    // both margin joins) and Spark does not dedupe common subplans —
    // checkpoint so the expensive kNN scans never re-run. LAZY: every
    // consumer is in the one returned plan; blocks still compute once
    val f = fwd.select(col("query_id").as("x_id"),
      col("neighbor_id").as("y_id"), cosQ(col("cosine")).as("__cq"))
      .localCheckpoint(eager = false)
    val b = bwd.select(col("query_id").as("y_id"),
      col("neighbor_id").as("x_id"), cosQ(col("cosine")).as("__cq"))
      .localCheckpoint(eager = false)
    // per-side neighborhood mass: Σ of the side's top-k quantized
    // cosines + the actual neighbor count (≤ k on small corpora) —
    // integer sums, so reduction order cannot move the result
    val ax = f.groupBy(col("x_id"))
      .agg(sum(col("__cq")).as("__axq"), count(lit(1)).as("__axn"))
    val ay = b.groupBy(col("y_id"))
      .agg(sum(col("__cq")).as("__ayq"), count(lit(1)).as("__ayn"))
    // margin_q = floor(cq · 2·axn·ayn · 10⁶ / (axq·ayn + ayq·axn)) —
    // the ratio margin with each side's mean as an exact rational;
    // magnitudes: cq ≤ 10⁴, counts ≤ k, so the numerator stays well
    // inside BIGINT. Non-positive cosines/denominators are dropped —
    // a pair whose neighborhoods are net-negative has no meaningful
    // density ratio (and real mining corpora never produce one).
    def margins(cands: DataFrame): DataFrame =
      cands.join(ax, Seq("x_id")).join(ay, Seq("y_id"))
        .filter(col("__cq") > 0 &&
          col("__axq") * col("__ayn") + col("__ayq") * col("__axn") > 0)
        .select(col("x_id"), col("y_id"),
          (col("__cq") * lit(2L) * col("__axn") * col("__ayn") * lit(1000000L))
            .as("__num"),
          (col("__axq") * col("__ayn") + col("__ayq") * col("__axn"))
            .as("__den"))
        // `div` is SQL integer division — exact long arithmetic (a
        // floored double quotient can misround at an integer boundary)
        .selectExpr("x_id", "y_id",
          "CAST(__num div __den AS LONG) AS margin_q")
    val wf = Window.partitionBy(col("x_id"))
      .orderBy(col("margin_q").desc, col("y_id"))
    val fbest = margins(f).withColumn("__r", row_number().over(wf))
      .filter(col("__r") === 1).drop("__r")
    val wb = Window.partitionBy(col("y_id"))
      .orderBy(col("margin_q").desc, col("x_id"))
    val bbest = margins(b).withColumn("__r", row_number().over(wb))
      .filter(col("__r") === 1).drop("__r")
    // mutual best: the pair survives only if each side elected the
    // other (margin_q is symmetric by construction, so the semi-join
    // needs no score reconciliation)
    fbest.join(bbest.select(col("x_id"), col("y_id")), Seq("x_id", "y_id"),
        "left_semi")
      .filter(col("margin_q") >= marginThresholdQ)
  }

  /** Brute-force mining — the gate-scale/oracle path: both kNN legs are
    * [[Similarity.bruteForceTopK]] (queries broadcast, exact cosine).
    * Returns (x_id, y_id, margin_q), margin_q on the ×10⁶ integer grid
    * (1050000 = the literature's 1.05 operating threshold).
    */
  def mineParallelPairs(xs: DataFrame, ys: DataFrame, idCol: String,
      vecCol: String, k: Int = 4,
      marginThresholdQ: Long = 1050000L): DataFrame = {
    requireK(k)
    minedFromTopK(
      unshift(Similarity.bruteForceTopK(shift(xs, idCol, vecCol), ys,
        idCol, vecCol, k)),
      unshift(Similarity.bruteForceTopK(shift(ys, idCol, vecCol), xs,
        idCol, vecCol, k)),
      marginThresholdQ)
  }

  /** margin_q's exact integer numerator is cq·2·k²·10⁶ ≤ 2·10¹⁰·k² —
    * k above ~2·10⁴ would wrap Long silently; no real mining operates
    * anywhere near that (the literature uses 4–16), so refuse loudly.
    */
  private def requireK(k: Int): Unit =
    require(k > 0 && k <= 10000,
      s"k must be in [1, 10000] (margin arithmetic is exact there): $k")

  /** Move the query side's ids into the disjoint [[IdOffset]] namespace
    * so the legs' single-corpus self-match rule cannot fire across the
    * two corpora; [[unshift]] restores them on the leg's output.
    */
  private def shift(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select((qcol(idCol).cast("long") + lit(IdOffset)).as(idCol),
      qcol(vecCol).as(vecCol))

  private def unshift(topk: DataFrame): DataFrame =
    topk.withColumn("query_id", col("query_id") - lit(IdOffset))

  /** The 100 TB path: each side's kNN leg is the PERSISTED IVF index's
    * nprobe-pruned serving ([[AnnIndex.ivfTopK]] — partition pruning
    * bounds the scanned corpus share), margins/mutual identical. At
    * full probe (nprobe = nlist) the legs are exact and the mined set
    * equals [[mineParallelPairs]] bit-for-bit (spec-pinned); pruned
    * probes trade the standard IVF recall for the standard IVF cost.
    * `xIndexDir` holds X's vectors (serves the backward leg),
    * `yIndexDir` holds Y's.
    */
  def mineParallelPairsIvf(spark: SparkSession, xIndexDir: String,
      yIndexDir: String, xs: DataFrame, ys: DataFrame, idCol: String,
      vecCol: String, k: Int = 4, nprobe: Int = 4,
      marginThresholdQ: Long = 1050000L): DataFrame = {
    requireK(k)
    minedFromTopK(
      unshift(AnnIndex.ivfTopK(spark, AnnIndex.readIvf(spark, yIndexDir),
        shift(xs, idCol, vecCol), idCol, vecCol, k, nprobe)),
      unshift(AnnIndex.ivfTopK(spark, AnnIndex.readIvf(spark, xIndexDir),
        shift(ys, idCol, vecCol), idCol, vecCol, k, nprobe)),
      marginThresholdQ)
  }
}
