package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Isotonic calibration by Pool-Adjacent-Violators (Ayer et al. 1955;
  * the sklearn `IsotonicRegression` / Zadrozny & Elkan 2002 calibration
  * recipe): fit the best non-decreasing step function from a quantized
  * score to an empirical positive rate — the standard post-hoc
  * calibrator for a quality/routing scorer whose raw scores are
  * monotone-but-miscalibrated.
  *
  * Distributed shape (the AUC/histogram discipline): the corpus
  * reduces FIRST to per-distinct-score blocks (score_q, n, n_pos) —
  * one shuffle, output bounded by the score GRID, never the row count
  * — and the sequential PAV sweep runs over the collected blocks,
  * driver state ≤ grid size by construction (the same bounded-collect
  * contract as the Bloom filter's bit array and k-center's k picks),
  * enforced by a loud [[MaxGridBlocks]] refusal rather than caller
  * discipline. At 100 TB the histogram is still grid-sized; the sweep
  * cost is the grid, not the data.
  *
  * Exactness: block means are compared by CROSS-MULTIPLICATION of
  * exact integer (sum_pos, n) pairs in BigInt — no float and no Long
  * wrap ever decides a merge (pooled counters are corpus-sized, so at
  * ~1e12 rows the products overflow Long) — and the fitted rate
  * publishes as floor(pos·10⁶ / n) on the family grid, so a second
  * engine replays the whole fit bit-for-bit (the x_calibrate_isotonic
  * oracle drives an equivalent merge machine in SQL). PAV pools
  * adjacent blocks while the left mean EXCEEDS the right (strict
  * violation; equal means need no pool and pooling them anyway would
  * not change any fitted value).
  */
object Calibrate {

  /** Hard cap on the distinct-score count a fit will collect: the
    * driver-side sweep is grid-bounded BY CONTRACT (the caller
    * quantizes the score), and an unquantized score column would
    * otherwise turn the bounded collect corpus-cardinality-sized and
    * OOM the driver with no message. The same loud-refusal precedent
    * as `bloomSemiJoin`'s mBits cap.
    */
  val MaxGridBlocks: Int = 100000

  /** Fit over (scoreCol, labelCol): one histogram shuffle, then the PAV
    * sweep. Output one row per distinct score: (score_q, n, n_pos,
    * fit_pos, fit_n, fit_q) where (fit_pos, fit_n) is the pooled
    * block's exact rational and fit_q its ×10⁶ floor — non-decreasing
    * in score_q by construction. Null scores/labels are dropped.
    */
  def isotonicFit(df: DataFrame, scoreCol: Column,
      labelCol: Column): DataFrame =
    isotonicFromHistogram(df
      .filter(scoreCol.isNotNull && labelCol.isNotNull)
      .select(scoreCol.cast("long").as("score_q"),
        when(labelCol, 1L).otherwise(0L).as("__p"))
      .groupBy(col("score_q"))
      .agg(count(lit(1)).as("n"), sum(col("__p")).as("n_pos")))

  /** Fit from an already-reduced histogram (`score_q`, `n`, `n_pos`) —
    * the streaming entry point: per-batch histogram deltas are
    * ASSOCIATIVE counters, so the summed delta store of a score-
    * histogram stream fed here fits the IDENTICAL calibrator as the
    * batch [[isotonicFit]] over the raw log (x_stream_calibrate pins
    * streamed == batch through the full merge machine). Rows with a
    * null score are dropped; the collect is grid-bounded and refuses
    * loudly past [[MaxGridBlocks]].
    */
  def isotonicFromHistogram(hist: DataFrame): DataFrame = {
    val spark = hist.sparkSession
    val blocks = hist
      .filter(col("score_q").isNotNull)
      .select(col("score_q").cast("long"), col("n").cast("long"),
        col("n_pos").cast("long"))
      // defensive re-reduction: an un-grouped store read (duplicate
      // score_q rows) would otherwise become duplicate PAV blocks, and
      // two fit rows with equal score have no deterministic order under
      // the serve window — re-group so the fit is well-defined on ANY
      // input shape. On an already-reduced histogram the child is hash-
      // partitioned on score_q, so this adds no shuffle.
      .groupBy(col("score_q"))
      .agg(sum(col("n")).as("n"), sum(col("n_pos")).as("n_pos"))
      .orderBy(col("score_q"))
      // one TakeOrdered job: the +1 row is the overflow detector, so a
      // contract-violating caller costs MaxGridBlocks rows of driver
      // memory, not the corpus
      .limit(MaxGridBlocks + 1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    require(blocks.length <= MaxGridBlocks,
      s"isotonicFit: more than $MaxGridBlocks distinct quantized scores — " +
        "the driver-side PAV sweep is bounded by the score GRID by " +
        "contract; quantize the score column onto a coarser grid first " +
        "(an unquantized double cast to long is corpus-cardinality-sized)")
    val fitted = pav(blocks)
    import spark.implicits._
    fitted.toSeq.toDF("score_q", "n", "n_pos", "fit_pos", "fit_n", "fit_q")
  }

  /** Serve a fitted calibrator: each row's calibrated rate is the
    * fitted value of the LAST block at or below its score (the step
    * function a monotone fit defines); scores below the first block
    * clamp to it, scores above the last ride its plateau — the standard
    * isotonic serving rule. An EMPTY fit refuses loudly — a left join
    * against it would silently calibrate everything to the
    * below-domain clamp, and there is nothing to clamp to.
    *
    * Serve plan (the r19 fix — a broadcast INTERVAL join here is a
    * nested loop, O(rows·blocks) comparisons, and at the ×100 grid it
    * billed 5 cpu-s on 50k rows): the step lookup materializes as a
    * VALUE TABLE first — distinct scored scores union fit starts, one
    * window over that ≤ 2·grid-row frame propagating the last fit_q at
    * or below each score — and the corpus then joins it by broadcast
    * HASH EQUALITY on the quantized score. The window and the
    * broadcast are grid-bounded, enforced by the same loud
    * [[MaxGridBlocks]] refusal the fit carries (an unquantized score
    * must not silently become a corpus-sized single-task window sort
    * and a driver-OOM broadcast); the only
    * corpus-sized work is one codegen'd hash probe per row.
    *
    * Output: the scored frame's columns plus `cal_q` (the ×10⁶ fitted
    * rate). Null scores calibrate to null.
    */
  def isotonicApply(fit: DataFrame, scored: DataFrame,
      scoreCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the below-domain clamp, as a driver literal: the fit is
    // grid-bounded so this is a ≤1-row TakeOrdered, and an empty fit
    // (the fitting slice matched no rows) fails HERE with a message
    // instead of silently dropping every scored row downstream
    val first = fit.select(col("score_q"), col("fit_q"))
      .orderBy(col("score_q")).limit(1).collect()
    require(first.nonEmpty,
      "isotonicApply: empty fit — the fitting slice matched no rows; " +
        "nothing to calibrate against")
    val c0 = first(0).getLong(1)
    val held = scored.withColumn("__s", scoreCol.cast("long"))
    // loud serve-side grid guard, mirroring the fit's: the merged-grid
    // window below is UNPARTITIONED and the lookup table broadcasts —
    // both grid-bounded only by the quantize contract, so an
    // unquantized score column would silently become a corpus-sized
    // single-task sort + a driver-OOM broadcast. The +1 row is the
    // overflow detector; the checkpoint materializes the distinct once
    // (≤ cap+1 rows) so the probe and the merge share one corpus pass.
    val scoredScores = held.select(col("__s")).filter(col("__s").isNotNull)
      .distinct().limit(MaxGridBlocks + 1)
      .localCheckpoint(eager = true)
    require(scoredScores.count() <= MaxGridBlocks,
      s"isotonicApply: more than $MaxGridBlocks distinct quantized " +
        "scores on the serve side — the step-propagation window and the " +
        "broadcast lookup are bounded by the score GRID by contract; " +
        "quantize the score column onto a coarser grid first")
    // merged grid: fit starts carry their fit_q, scored scores carry
    // null; at an equal score the fit row sorts first, so the running
    // last(fit_q) hands a boundary score its own block
    val merged = scoredScores
      .withColumn("__fq", lit(null).cast("long"))
      .unionByName(fit.select(col("score_q").as("__s"),
        col("fit_q").as("__fq")))
    val w = Window.orderBy(col("__s"), col("__fq").isNull)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lut = merged
      .withColumn("__cal", coalesce(
        last(col("__fq"), ignoreNulls = true).over(w), lit(c0)))
      .filter(col("__fq").isNull) // keep one lookup row per scored score
      .select(col("__s"), col("__cal"))
    held.join(broadcast(lut), Seq("__s"), "left")
      .withColumn("cal_q", when(col("__s").isNull, lit(null).cast("long"))
        .otherwise(col("__cal")))
      .drop("__s", "__cal")
  }

  /** The exact-integer PAV sweep over score-ascending blocks
    * (score_q, n, n_pos): push each block, then merge the top two stack
    * runs while the left mean strictly exceeds the right
    * (lPos·rN > rPos·lN, compared in BigInt — pooled counters are
    * corpus-sized, so the Long product wraps near ~3e9 pooled rows and
    * a wrapped compare would silently corrupt merges; the sweep is a
    * grid-sized driver loop, so exact arithmetic is free). Returns one
    * row per INPUT block with its pooled run's rational and ×10⁶ floor
    * — block granularity is preserved so the output is
    * pooling-boundary-independent.
    */
  private[ext] def pav(blocks: Seq[(Long, Long, Long)])
      : Seq[(Long, Long, Long, Long, Long, Long)] = {
    // stack of pooled runs: (start index, pooled n, pooled pos)
    val stk = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    blocks.zipWithIndex.foreach { case ((_, n, p), i) =>
      stk += ((i, n, p))
      var merging = true
      while (merging && stk.size >= 2) {
        val (_, rn, rp) = stk(stk.size - 1)
        val (ls, ln, lp) = stk(stk.size - 2)
        // left mean > right mean — exact cross-multiplication, no wrap
        if (BigInt(lp) * rn > BigInt(rp) * ln) {
          stk.remove(stk.size - 1)
          stk(stk.size - 1) = (ls, ln + rn, lp + rp)
        } else merging = false
      }
    }
    val runOf = new Array[(Long, Long)](blocks.size) // (fit_pos, fit_n)
    stk.zipWithIndex.foreach { case ((st, n, p), ri) =>
      val en = if (ri + 1 < stk.size) stk(ri + 1)._1 - 1 else blocks.size - 1
      (st to en).foreach(i => runOf(i) = (p, n))
    }
    blocks.zipWithIndex.map { case ((s, n, p), i) =>
      val (fp, fn) = runOf(i)
      // fp·10⁶ wraps Long past ~9e12 positives — same BigInt discipline
      (s, n, p, fp, fn, (BigInt(fp) * 1000000 / fn).toLong)
    }
  }
}
