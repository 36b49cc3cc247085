package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols.qcol
import graft.operators.Ids

/** Distributed order statistics.
  *
  * Spark's exact `percentile` aggregate buffers EVERY value of a group in
  * one aggregation buffer (collect-then-sort) — at 100 TB that is an OOM on
  * the task holding the biggest group. `quantileCont` computes the same
  * linear-interpolation quantile (SQL `quantile_cont`) from global order
  * statistics instead:
  *
  *   1. global rank over (group, value) via the range-partition + prefix-sum
  *      rank (Ids.globalRowNumber — distributed sort, no single-task window),
  *   2. per-group count + first-rank from one small aggregate,
  *   3. per (group, prob) the two bracketing ranks h = (n-1)p are computed
  *      driver-free; the ≤ |groups|·|probs|·2 needed ranks broadcast-join
  *      back against the ranked frame (one scan picks the values),
  *   4. v_lo + frac·(v_hi − v_lo) assembled on the tiny picked frame.
  *
  * Three narrow passes over the data (rank materialization, group-stats
  * aggregate, pick scan — the latter two over lineage-cut blocks), all
  * fully partition-parallel; per-task memory is O(partition), never
  * O(group).
  */
object Stats {

  /** One row per group: (`groupCol`, `n`, one column per prob name).
    * `probs` are (output column name, probability in [0, 1]). Null values
    * are excluded from the quantile computation (SQL quantile semantics —
    * they would otherwise rank first and shift every bracket) but a group
    * whose values are ALL null still emits its row with null quantiles
    * and `n` = 0; `n` counts non-null values.
    */
  def quantileCont(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      probs: Seq[(String, Double)],
  ): DataFrame = {
    // lineage cut FIRST: the source plan executes once; the rank
    // assignment (which range-samples, i.e. reads its input twice), the
    // group-stats pass, and the all-groups list below all read blocks
    val base = df.select(qcol(groupCol).as("__g"), qcol(valueCol).cast("double").as("__v"))
      .localCheckpoint(eager = true)
    val ranked = Ids.globalRowNumber(base.filter(col("__v").isNotNull),
      Seq(col("__g"), col("__v")), "__rk")
    val stats = ranked.groupBy(col("__g"))
      .agg(count(lit(1)).as("__n"), min(col("__rk")).as("__rk0"))
    val h = (col("__n") - 1) * col("__q.p") // fractional rank, 0-based
    // group-count rows only, but derived from a full ranked scan —
    // lineage-cut so the three consumers below don't re-aggregate it
    val targets = stats.select(col("__g"), col("__n"), col("__rk0"),
      explode(array(probs.map { case (nm, p) =>
        struct(lit(nm).as("nm"), lit(p).as("p")) }: _*)).as("__q"))
      .select(col("__g"), col("__n"), col("__q.nm").as("__nm"),
        (col("__rk0") + floor(h)).as("__lo"),
        least(col("__rk0") + floor(h) + 1, col("__rk0") + col("__n") - 1).as("__hi"),
        (h - floor(h)).as("__frac"))
      .localCheckpoint(eager = false) // lazy: all consumers in one plan
    // global ranks are unique across groups, so the pick joins on rank alone
    val wanted = targets
      .select(explode(array(col("__lo"), col("__hi"))).as("__rk")).distinct()
    // ONE scan of the ranked data picks every needed value; the picked
    // frame is group-count-sized, so its reuse below is trivial
    val picked = ranked.join(broadcast(wanted), Seq("__rk"))
      .select(col("__rk"), col("__v"))
      .localCheckpoint(eager = false) // lazy: both pick joins in one plan
    val quantiles = targets
      .join(picked.select(col("__rk").as("__lo"), col("__v").as("__vlo")), Seq("__lo"))
      .join(picked.select(col("__rk").as("__hi"), col("__v").as("__vhi")), Seq("__hi"))
      .select(col("__g"), col("__n"), col("__nm"),
        (col("__vlo") + col("__frac") * (col("__vhi") - col("__vlo"))).as("__qv"))
      .groupBy(col("__g"), col("__n"))
      .pivot("__nm", probs.map(_._1))
      .agg(first(col("__qv")))
    // restore groups whose values were all null (SQL keeps the group row);
    // null-safe join key — a NULL group value is a legitimate group
    val allGroups = base.select(col("__g")).distinct()
    allGroups
      .join(quantiles.withColumnRenamed("__g", "__gq"),
        allGroups("__g") <=> col("__gq"), "left")
      .drop("__gq")
      .withColumn("__n", coalesce(col("__n"), lit(0L)))
      .withColumnRenamed("__g", groupCol)
      .withColumnRenamed("__n", "n")
  }

  /** Exact per-group heavy hitters: the top-`k` most frequent `valueCol`
    * values per group, ranked by (count desc, value asc) so ties are
    * deterministic. One partial-aggregated count (map-side combine
    * shrinks each partition to its distinct (group, value) pairs before
    * the shuffle) + one window over the GROUP×DISTINCT-VALUE frame —
    * far smaller than the data; per-task memory O(partition), never
    * O(group).
    *
    * Output: (groupCol, rank, valueCol, n).
    */
  /** Equi-depth binning (feature bucketization): assign every row its
    * ntile bucket WITHOUT a single-partition global window — the rank
    * comes from the distributed range-partitioned
    * [[Ids.globalRowNumber]] and the bucket from the closed-form ntile
    * arithmetic (first `n mod bins` buckets hold ⌈n/bins⌉ rows —
    * SQL-standard ntile, integer math, engine-exact). Ties order by
    * (`valueCol`, `tieCol`) so the assignment is deterministic.
    *
    * Returns the per-bucket summary (`bin`, `n`, `min_v`, `max_v`);
    * nulls are excluded (they have no order position).
    */
  def equiDepthBins(df: DataFrame, valueCol: String, tieCol: String,
      bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    val base = df.select(qcol(valueCol).cast("double").as("__v"),
        qcol(tieCol).as("__t"))
      .filter(col("__v").isNotNull)
      .localCheckpoint(eager = true) // ranked scan + count read it
    val n = base.count()
    if (n == 0L) return base.sparkSession.range(0)
      .select(lit(0).as("bin"), lit(0L).as("n"),
        lit(0.0).as("min_v"), lit(0.0).as("max_v"))
    val q = n / bins
    val r = n % bins
    val ranked = Ids.globalRowNumber(base, Seq(col("__v"), col("__t")), "__rk")
    val bin = when(lit(r) > 0 && col("__rk") <= lit(r * (q + 1)),
        (col("__rk") - 1) / lit(q + 1) + 1)
      .otherwise((col("__rk") - lit(r * (q + 1)) - 1) / lit(q) + lit(r) + 1)
    ranked.select(bin.cast("int").as("bin"), col("__v"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), round(min(col("__v")), 4).as("min_v"),
        round(max(col("__v")), 4).as("max_v"))
  }

  /** Population-stability-index drift report between a REFERENCE and a
    * CURRENT snapshot, per group: equi-width bins over a FIXED domain
    * [lo, hi) (edges data-independent, so two engines — and two months —
    * bin identically; out-of-range values clamp to the edge bins, nulls
    * are excluded on both sides), Laplace-smoothed shares
    * p_b = (n_b + eps) / (N + eps·bins), and
    * PSI = Σ_b (p_b − q_b)·ln(p_b / q_b) — the standard monitoring
    * statistic (≥ 0; ~0.1 "investigate", ~0.25 "shifted" in the usual
    * reading). The sum runs over the FULL bin domain, generated per
    * group: under Laplace smoothing an empty-both-sides bin still
    * contributes (eps/(N_r+eps·b) − eps/(N_c+eps·b))·ln(·), which is
    * nonzero whenever the two sides' totals differ — dropping those
    * bins would understate the textbook smoothed PSI.
    *
    * Scale shape: one union pass → a (group, bin)-keyed counting
    * group-by (map-side combined, counters-sized) → a generated
    * (group × bins) domain left-joined with the observed counts → a
    * bins-sized aggregate. Nothing corpus-sized shuffles; adding groups
    * or bins grows the counter table, not the scan.
    *
    * Output: (`groupCol`, `n_ref`, `n_cur`, `psi` rounded 6dp). The
    * rounding is a DELIBERATE tolerance, kept only here: psi contains
    * ln(), whose last-ulp value is libm-implementation-specific, and
    * the per-bin terms are summed in engine-chosen order — unlike the
    * ks/percentiles outputs, bit-exact cross-engine psi is not
    * attainable, so 6dp absorbs the transcendental + summation-order
    * seam (a boundary-straddling value would diverge; acceptable for a
    * monitoring statistic whose decisions live at 0.1/0.25).
    */
  def psi(ref: DataFrame, cur: DataFrame, groupCol: String, valueCol: Column,
      bins: Int, lo: Double, hi: Double, eps: Double = 0.5,
      roundDp: Option[Int] = Some(6)): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    require(hi > lo, s"empty bin domain: [$lo, $hi)")
    val width = (hi - lo) / bins
    def binOf(c: Column): Column =
      least(greatest(floor((c.cast("double") - lo) / width), lit(0.0)),
        lit((bins - 1).toDouble)).cast("int")
    def side(df: DataFrame, r: Int, c: Int): DataFrame =
      df.filter(valueCol.isNotNull)
        .select(qcol(groupCol).as("__g"), binOf(valueCol).as("__b"),
          lit(r).as("__r"), lit(c).as("__c"))
    val counts = side(ref, 1, 0).unionByName(side(cur, 0, 1))
      .groupBy(col("__g"), col("__b"))
      .agg(sum(col("__r")).as("__nr"), sum(col("__c")).as("__nc"))
    psiFromBinCounts(counts, bins, eps, roundDp).withColumnRenamed("__g", groupCol)
  }

  /** The PSI tail over already-binned counts — shared by [[psi]] and the
    * streaming drift monitor (bin counts are associative, so a delta
    * store's summed counters feed the same arithmetic). `counts` rows:
    * (`__g`, `__b`, `__nr`, `__nc`); output (`__g`, `n_ref`, `n_cur`,
    * `psi`).
    */
  private[graft] def psiFromBinCounts(counts: DataFrame, bins: Int,
      eps: Double, roundDp: Option[Int] = Some(6)): DataFrame = {
    // distinct names from the per-bin counts: the analyzer resolves
    // case-insensitively, so __Nr would collide with __nr
    val totals = counts.groupBy(col("__g"))
      .agg(sum(col("__nr")).as("__tr"), sum(col("__nc")).as("__tc"))
    // full bin domain per group (groups × bins rows — counter-sized, not
    // corpus-sized): unobserved bins enter with 0/0 counts so their
    // smoothed contribution is summed, not silently dropped
    val domain = totals.select(col("__g"), col("__tr"), col("__tc"),
      explode(sequence(lit(0), lit(bins - 1))).as("__b"))
    val p = (coalesce(col("__nr"), lit(0L)) + eps) / (col("__tr") + eps * bins)
    val q = (coalesce(col("__nc"), lit(0L)) + eps) / (col("__tc") + eps * bins)
    domain.join(counts, Seq("__g", "__b"), "left")
      .select(col("__g"), col("__tr"), col("__tc"),
        ((p - q) * log(p / q)).as("__t"))
      .groupBy(col("__g"))
      .agg(first(col("__tr")).as("n_ref"), first(col("__tc")).as("n_cur"),
        // roundDp=None serves equality GATES comparing two same-engine
        // computations: both sides rounding to 6dp first turns a
        // summation-order straddle at the rounding boundary into a 1e-6
        // jump no small tolerance can absorb (r13 ADVICE) — gates
        // compare the raw sums instead
        roundDp.map(dp => round(sum(col("__t")), dp))
          .getOrElse(sum(col("__t"))).as("psi"))
  }

  /** The shared fixed-domain equi-width binning of [[psi]]/[[ksDrift]],
    * exposed for the streaming drift monitor's per-batch counting. */
  private[graft] def binExpr(c: Column, bins: Int, lo: Double,
      hi: Double): Column = {
    val width = (hi - lo) / bins
    least(greatest(floor((c.cast("double") - lo) / width), lit(0.0)),
      lit((bins - 1).toDouble)).cast("int")
  }

  /** Kolmogorov–Smirnov drift statistic over the SAME fixed-domain
    * equi-width bins as [[psi]]: KS = max_b |F_ref(b) − F_cur(b)|, the
    * largest gap between the two binned CDFs. PSI weights every bin's
    * relative shift (log-ratio — sensitive to tail bins); KS reads the
    * single worst cumulative gap (bounded in [0,1], distribution-free
    * critical values) — monitoring stacks run both because they fire on
    * different shift shapes. Same counters-sized shuffle shape as psi;
    * the CDF is a window cumsum over ≤ `bins` rows per group. Bins
    * observed on neither side need no row: both CDFs are flat there,
    * so the running gap cannot reach a new extremum — observed-bin max
    * IS the full-domain max.
    *
    * Output: (`groupCol`, `n_ref`, `n_cur`, `ks` unrounded — every gap
    * is integer/integer in IEEE, so it reproduces bit-for-bit).
    */
  def ksDrift(ref: DataFrame, cur: DataFrame, groupCol: String,
      valueCol: Column, bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    require(hi > lo, s"empty bin domain: [$lo, $hi)")
    import org.apache.spark.sql.expressions.Window
    val width = (hi - lo) / bins
    def binOf(c: Column): Column =
      least(greatest(floor((c.cast("double") - lo) / width), lit(0.0)),
        lit((bins - 1).toDouble)).cast("int")
    def side(df: DataFrame, r: Int, c: Int): DataFrame =
      df.filter(valueCol.isNotNull)
        .select(qcol(groupCol).as("__g"), binOf(valueCol).as("__b"),
          lit(r).as("__r"), lit(c).as("__c"))
    val counts = side(ref, 1, 0).unionByName(side(cur, 0, 1))
      .groupBy(col("__g"), col("__b"))
      .agg(sum(col("__r")).as("__nr"), sum(col("__c")).as("__nc"))
    ksFromBinCounts(counts).withColumnRenamed("__g", groupCol)
  }

  /** The KS tail over already-binned counts — shared by [[ksDrift]] and
    * the streaming drift monitor (the [[psiFromBinCounts]] pattern).
    * `counts` rows: (`__g`, `__b`, `__nr`, `__nc`); output (`__g`,
    * `n_ref`, `n_cur`, `ks`).
    */
  private[graft] def ksFromBinCounts(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__g")).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = counts.groupBy(col("__g"))
      .agg(sum(col("__nr")).as("__tr"), sum(col("__nc")).as("__tc"))
    counts
      .withColumn("__cr", sum(col("__nr")).over(w))
      .withColumn("__cc", sum(col("__nc")).over(w))
      .join(broadcast(totals), Seq("__g"))
      .select(col("__g"), col("__tr"), col("__tc"),
        // a side with no rows has an identically-zero CDF: its group's
        // ks is then the other side's max cumulative share (= 1.0) —
        // not a division by zero
        abs(when(col("__tr") === 0, lit(0.0))
            .otherwise(col("__cr").cast("double") / col("__tr")) -
          when(col("__tc") === 0, lit(0.0))
            .otherwise(col("__cc").cast("double") / col("__tc"))).as("__gap"))
      .groupBy(col("__g"))
      // UNROUNDED: every gap is integer-cumsum / integer-total — two
      // deterministic IEEE ops on identical operands in any engine — and
      // max() picks one value rather than summing, so the double is
      // bit-reproducible cross-engine with no rounding tolerance (the
      // x_stats_percentiles discipline; rounding would reintroduce a
      // boundary-straddle hazard)
      .agg(first(col("__tr")).as("n_ref"), first(col("__tc")).as("n_cur"),
        max(col("__gap")).as("ks"))
  }

  def topKPerGroup(df: DataFrame, groupCol: String, valueCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val counts = df.groupBy(qcol(groupCol).as("__g"), qcol(valueCol).as("__v"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__g"))
      .orderBy(col("n").desc, col("__v"))
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__g").as(groupCol), col("rank"), col("__v").as(valueCol),
        col("n"))
  }
}
