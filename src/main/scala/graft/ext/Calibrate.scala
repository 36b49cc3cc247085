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
  * contract as the Bloom filter's bit array and k-center's k picks).
  * At 100 TB the histogram is still grid-sized; the sweep cost is the
  * grid, not the data.
  *
  * Exactness: block means are compared by CROSS-MULTIPLICATION of
  * exact integer (sum_pos, n) pairs — no float ever decides a merge —
  * and the fitted rate publishes as floor(pos·10⁶ / n) on the family
  * grid, so a second engine replays the whole fit bit-for-bit (the
  * x_calibrate_isotonic oracle drives the identical merge machine as a
  * recursive CTE). PAV pools adjacent blocks while the left mean
  * EXCEEDS the right (strict violation; equal means need no pool and
  * pooling them anyway would not change any fitted value).
  */
object Calibrate {

  /** Fit over (scoreCol, labelCol): one histogram shuffle, then the PAV
    * sweep. Output one row per distinct score: (score_q, n, n_pos,
    * fit_pos, fit_n, fit_q) where (fit_pos, fit_n) is the pooled
    * block's exact rational and fit_q its ×10⁶ floor — non-decreasing
    * in score_q by construction. Null scores/labels are dropped.
    */
  def isotonicFit(df: DataFrame, scoreCol: Column,
      labelCol: Column): DataFrame = {
    val spark = df.sparkSession
    val blocks = df
      .filter(scoreCol.isNotNull && labelCol.isNotNull)
      .select(scoreCol.cast("long").as("score_q"),
        when(labelCol, 1L).otherwise(0L).as("__p"))
      .groupBy(col("score_q"))
      .agg(count(lit(1)).as("n"), sum(col("__p")).as("n_pos"))
      .orderBy(col("score_q"))
      .collect() // ≤ |score grid| rows — the documented bounded collect
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val fitted = pav(blocks)
    import spark.implicits._
    fitted.toSeq.toDF("score_q", "n", "n_pos", "fit_pos", "fit_n", "fit_q")
  }

  /** Serve a fitted calibrator: each row's calibrated rate is the
    * fitted value of the LAST block at or below its score (the step
    * function a monotone fit defines); scores below the first block
    * clamp to it, scores above the last ride its plateau — the standard
    * isotonic serving rule. The fit is grid-bounded, so it broadcasts
    * and the lookup is one interval join ([score_q, next block) ranges
    * from one lead window over the fit), never a shuffle of the scored
    * corpus.
    *
    * Output: the scored frame's columns plus `cal_q` (the ×10⁶ fitted
    * rate). Null scores calibrate to null.
    */
  def isotonicApply(fit: DataFrame, scored: DataFrame,
      scoreCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("__lo")) // fit is grid-bounded
    val iv = fit.select(col("score_q").as("__lo"), col("fit_q"))
      .withColumn("__hi", lead(col("__lo"), 1).over(w))
    val first = fit.select(col("score_q").as("__f0"), col("fit_q").as("__c0"))
      .orderBy(col("__f0")).limit(1)
    scored.withColumn("__s", scoreCol.cast("long"))
      .join(broadcast(iv),
        col("__s") >= col("__lo") &&
          (col("__hi").isNull || col("__s") < col("__hi")), "left")
      .crossJoin(broadcast(first))
      .withColumn("cal_q", when(col("__s").isNull, lit(null).cast("long"))
        .otherwise(coalesce(col("fit_q"), col("__c0"))))
      .drop("__s", "__lo", "__hi", "fit_q", "__f0", "__c0")
  }

  /** The exact-integer PAV sweep over score-ascending blocks
    * (score_q, n, n_pos): push each block, then merge the top two stack
    * runs while the left mean strictly exceeds the right
    * (lPos·rN > rPos·lN). Returns one row per INPUT block with its
    * pooled run's rational and ×10⁶ floor — block granularity is
    * preserved so the output is pooling-boundary-independent.
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
        // left mean > right mean — exact cross-multiplication
        if (lp * rn > rp * ln) {
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
      (s, n, p, fp, fn, fp * 1000000L / fn)
    }
  }
}
