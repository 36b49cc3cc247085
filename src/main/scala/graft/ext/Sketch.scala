package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) expressed as Spark
  * aggregations: the fixed-size frequency summary for when the exact
  * (group, count) table itself is too large to keep — depth×width
  * counters (a few KB) summarize an unbounded value stream, point
  * estimates never UNDERcount (est ≥ true always; overcount bounded by
  * εN w.h.p.).
  *
  * No custom aggregate needed: each value contributes one bucket per
  * depth row (an explode the partial aggregate combines map-side), so
  * building the sketch is ONE pass with a counters-sized shuffle.
  * Bucket hashing is the engine-portable md5-prefix form (the DSIR
  * bucketing discipline) — deterministic, so two engines build
  * bit-identical counter tables and the gates can hash-match the whole
  * estimate path instead of trusting a probabilistic band.
  */
object Sketch {

  /** Bucket of `v` in depth row `d`: first 8 hex chars of
    * md5(d ":" v), mod `width` — independent-enough hash rows, exactly
    * replayable (`CAST('0x'||substring(md5(…),1,8) AS UBIGINT) % width`).
    */
  private def bucket(d: Int, v: Column, width: Int): Column =
    conv(substring(md5(concat(lit(d.toString), lit(":"), v.cast("string"))),
      1, 8), 16, 10).cast("long") % width

  /** Build the counter table: (`d`, `b`, `n`) — at most depth·width
    * rows regardless of input size.
    */
  def cmsCounters(df: DataFrame, valueCol: Column, depth: Int,
      width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"bad sketch shape: $depth x $width")
    df.select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), bucket(d, valueCol, width).as("b"))): _*)).as("__c"))
      .groupBy(col("__c.d").as("d"), col("__c.b").as("b"))
      .agg(count(lit(1)).as("n"))
  }

  /** Point estimates for `queries` (distinct values in `valueCol`):
    * min over the depth rows' counters — the classic CM read. The
    * counter table is sketch-sized, so it broadcasts; estimating is one
    * narrow pass over the query set. Output: (valueCol, est_n).
    */
  def cmsEstimate(counters: DataFrame, queries: DataFrame, valueCol: String,
      depth: Int, width: Int): DataFrame = {
    val q = queries.select(col(valueCol)).distinct()
      .select(col(valueCol), explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), bucket(d, col(valueCol), width).as("b"))): _*)).as("__c"))
      .select(col(valueCol), col("__c.d").as("d"), col("__c.b").as("b"))
    q.join(broadcast(counters), Seq("d", "b"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("n"), lit(0L))).as("est_n"))
  }

  /** Hashing-trick featurizer (Weinberger et al. 2009): project an
    * unbounded categorical feature space into `k` buckets with a signed
    * hash — bucket = md5prefix(feature) mod k, sign from an INDEPENDENT
    * md5 ("s:"+feature) so sign and bucket are uncorrelated and
    * collisions cancel in expectation (the property that makes hashed
    * features usable without a vocabulary). Engine-portable like every
    * sketch here: a second engine rebuilds the identical feature
    * vector, so train/serve skew between two stacks is a hash-match
    * check, not a hope. Null features are dropped (no identity), null
    * values contribute nothing.
    *
    * Accumulation is FIXED-POINT: each row contributes
    * sign·floor(value·scale) as an int64, and the bucket weight is the
    * integer sum — exact, associative, and therefore independent of
    * partitioning, retry order, and engine (a float sum is none of
    * those; its round-to-4dp gate was the r12 ADVICE boundary-straddle
    * seam). Precision is 1/scale per row, the trade every
    * reproducible-training feature store makes. The double `weight` is
    * derived by ONE division from the integer, so it is bit-exact too.
    *
    * One counting pass, k-bounded output: (`bucket`, `weight_q` =
    * Σ floor(sign·value·scale) as int64, `weight` = weight_q/scale,
    * `n`).
    */
  def featureHash(df: DataFrame, featureCol: Column, valueCol: Column,
      k: Int, scale: Long = 10000L): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(scale > 0, s"scale must be positive: $scale")
    val f = featureCol.cast("string")
    df.filter(f.isNotNull && valueCol.isNotNull)
      .select((PortableHash.md5Prefix15(f) % k).as("bucket"),
        // quantize the MAGNITUDE first, apply the hash sign after: with
        // floor(sign·v·scale) a negatively-signed contribution is up to
        // 1/scale larger in magnitude than the same value positively
        // signed (floor truncates toward -inf), so collisions stop
        // cancelling in expectation — a small systematic negative bias
        // per bucket (r13 ADVICE). sign·floor(v·scale) is symmetric.
        (when(PortableHash.md5Prefix15(concat(lit("s:"), f)) % 2 === 0, 1)
          .otherwise(-1) * floor(valueCol.cast("double") * scale)).as("__w"))
      .groupBy(col("bucket"))
      .agg(sum(col("__w")).as("weight_q"),
        (sum(col("__w")).cast("double") / scale).as("weight"),
        count(lit(1)).as("n"))
  }

  // ------------------------------------------------- quantile summary
  /** Mergeable quantile summary — a KLL-style level structure (Karnin,
    * Lang & Liberty 2016) whose "compaction coin" is the engine-portable
    * md5 instead of randomness: each row's LEVEL is the trailing-zero
    * count of its key's 60-bit md5 prefix (a geometric ladder — half the
    * keys sit at level ≥ 1, a quarter at ≥ 2, …), and the summary at
    * capacity `k` keeps exactly the rows whose level clears the SMALLEST
    * cut `L` with |{level ≥ L}| ≤ k, each kept row standing for 2^L
    * originals. Rank estimates are the classic weighted count —
    * est_rank(q) = 2^L·|{kept v ≤ q}| — with the standard sampling
    * error n·O(1/√k).
    *
    * Deterministic levels buy the two properties the family is built
    * on: (a) ENGINE PORTABILITY — a second engine replays the exact
    * kept set and every estimate from the same tables (the CMS/KMV
    * discipline; the x_quantile_sketch gate hash-pins the whole path),
    * and (b) EXACT MERGEABILITY — the level cut depends only on the
    * union multiset, so summaries merge by union + re-cut: each part's
    * cut L_p never exceeds the union's cut L* (a subset's level counts
    * are ≤ the union's), hence every row the union cut keeps survived
    * its part's trim, and the merged summary equals the ONE-SHOT
    * summary bit-for-bit — associative, order-free (spec-pinned; the
    * streamed store rides [[graft.streaming.DocStreams]]'
    * exactly-once delta protocol like CMS/KMV and the
    * x_stream_quantile_sketch gate pins summed deltas == one-shot).
    *
    * Scale shape: one narrow pass computes levels (two md5-free integer
    * ops per candidate level over one md5), the cut selection is ONE
    * counter-sized aggregate (≤ maxLevel+1 longs to the driver), and
    * the kept set is ≤ k rows — never corpus-sized driver state.
    */
  case class QuantileSummary(level: Int, items: DataFrame)

  /** Trailing-zero level of the 60-bit md5 prefix of "qs:"+key, capped
    * at `maxLevel` — the md5-driven compaction coin. Replay:
    * `CASE WHEN h % 2^maxLevel = 0 THEN maxLevel WHEN … ELSE 0 END`
    * over `CAST('0x'||substring(md5('qs:'||key),1,15) AS UBIGINT)`
    * ([[quantileLevelSql]] emits exactly that chain).
    */
  private def tzLevel(h: Column, maxLevel: Int): Column = {
    var c = when(h % lit(1L << maxLevel) === 0, maxLevel)
    var l = maxLevel - 1
    while (l >= 1) { c = c.when(h % lit(1L << l) === 0, l); l -= 1 }
    c.otherwise(0)
  }

  /** The oracle-side twin of [[tzLevel]] as DuckDB SQL over an UBIGINT
    * expression — generated here so the gate SQL and the engine can
    * never drift on the chain.
    */
  def quantileLevelSql(h: String, maxLevel: Int): String =
    (maxLevel to 1 by -1)
      .map(l => s"WHEN $h % ${1L << l} = 0 THEN $l")
      .mkString("CASE ", " ", " ELSE 0 END")

  /** The per-row (level, value) frame a summary is cut from — shared by
    * the one-shot build and the streaming delta publisher. Null keys or
    * values carry no rank mass and are dropped.
    */
  def quantileLevelItems(df: DataFrame, keyCol: Column, valueCol: Column,
      maxLevel: Int = 20): DataFrame = {
    require(maxLevel >= 1 && maxLevel <= 40, s"bad maxLevel: $maxLevel")
    df.filter(keyCol.isNotNull && valueCol.isNotNull)
      .select(
        tzLevel(PortableHash.md5Prefix15(
          concat(lit("qs:"), keyCol.cast("string"))), maxLevel).as("__lvl"),
        valueCol.as("__v"))
  }

  /** Cut a summary out of (level, value) items: the smallest level
    * `L ≥ minLevel` whose survivor count fits `k`. `minLevel` is the
    * merge floor — when the items are a union of already-trimmed parts
    * (the streamed delta store), levels below the deepest part trim are
    * incomplete and must not be offered the cut (pass the max of the
    * parts' levels). The selection aggregate ships ≤ maxLevel+1 longs
    * to the driver; the kept frame is ≤ k rows.
    */
  def quantileSelect(items: DataFrame, k: Int, minLevel: Int = 0,
      maxLevel: Int = 20): QuantileSummary = {
    require(k >= 1, s"capacity must be positive: $k")
    require(minLevel >= 0 && minLevel <= maxLevel,
      s"bad level window: [$minLevel, $maxLevel]")
    val it = items.localCheckpoint(eager = true) // counts + cut share it
    val aggs = (minLevel to maxLevel).map(l =>
      coalesce(sum(when(col("__lvl") >= l, 1L).otherwise(0L)), lit(0L))
        .as(s"c$l"))
    val counts = it.agg(aggs.head, aggs.tail: _*).head()
    val level = (minLevel to maxLevel)
      .find(l => counts.getLong(l - minLevel) <= k)
      .getOrElse(throw new IllegalStateException(
        s"no level in [$minLevel, $maxLevel] fits k=$k " +
          s"(count at $maxLevel = ${counts.getLong(maxLevel - minLevel)}) " +
          "— raise maxLevel for this corpus size"))
    QuantileSummary(level, it.filter(col("__lvl") >= level))
  }

  /** One-shot summary over a frame — levels + cut in one call. */
  def quantileSketch(df: DataFrame, keyCol: Column, valueCol: Column,
      k: Int, maxLevel: Int = 20): QuantileSummary =
    quantileSelect(quantileLevelItems(df, keyCol, valueCol, maxLevel),
      k, 0, maxLevel)

  /** Merge two summaries: union + re-cut floored at the deeper part
    * trim. Equals the one-shot summary over the concatenated inputs
    * exactly, in any merge order (spec-pinned associativity).
    */
  def quantileMerge(a: QuantileSummary, b: QuantileSummary, k: Int,
      maxLevel: Int = 20): QuantileSummary =
    quantileSelect(a.items.unionByName(b.items), k,
      math.max(a.level, b.level), maxLevel)

  /** K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002) per
    * group: hash each value with the engine-portable 60-bit md5 prefix,
    * keep the k smallest DISTINCT hashes per group, estimate
    * |distinct| ≈ (k-1)·2^60 / h_(k) — the classic order-statistics
    * estimator; groups with fewer than k distinct values report their
    * exact count (the sketch degenerates to a complete sample).
    *
    * Same engine-portable discipline as the CMS: every stage —
    * hashing, the k-smallest cut, the estimate arithmetic (exact-double
    * operands: 2^60 and k-1 are exact, the IEEE divide is deterministic)
    * — replays bit-for-bit in a second engine's SQL, so reconciliation
    * can hash-match the ESTIMATES, not trust an error band.
    *
    * Scale shape: ONE bounded aggregate ([[graft.plans.KMinSetAgg]] —
    * each partition folds its rows into a ≤ k-entry k-min set
    * map-side, so the exchange carries at most groups·k·partitions
    * rows and nothing per-group ever sorts corpus-scale data; the old
    * distinct + per-group row_number window shuffled every near-unique
    * md5 prefix before cutting, a full corpus-wide shuffle at 100 TB).
    * k-min-of-distinct is associative and duplicate-insensitive, so
    * the result is the old cut's, bit for bit (gate-pinned).
    *
    * Output: (`groupCol`, `est_distinct` double, unrounded — it
    * reproduces bit-for-bit from the integer k-th order statistic).
    */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: Column,
      k: Int): DataFrame =
    kmvFromHashes(
      df.select(col(groupCol),
          PortableHash.md5Prefix15(valueCol).as("__h"))
        // null values carry no distinct identity — and a null hash would
        // sort FIRST and silently shift the k-th order statistic
        .filter(col("__h").isNotNull),
      groupCol, k)

  /** The estimator over already-hashed (`groupCol`, `__h`) rows — shared
    * by [[kmvDistinct]] and the streaming delta-store reader (k-min is
    * associative: the k smallest of a union are each among their own
    * batch's k smallest, so per-batch-trimmed deltas re-minimized here
    * equal the one-shot sketch EXACTLY).
    */
  /** The bounded k-min-set aggregate as a Column
    * ([[graft.plans.KMinSetAgg]]): the whole KMV family's sketch pass.
    * The old `distinct() → row_number window ≤ k` form shuffled EVERY
    * distinct hash (md5 prefixes are near-unique, so map-side partial
    * aggregation removed almost nothing — at 100 TB the k-row sketch
    * cost a corpus-wide shuffle plus a per-group sort); this one keeps
    * the k-min set bounded map-side, so the exchange carries at most
    * groups·k·partitions rows to the cut. Same k-min result by
    * construction (k-min-of-distinct is associative and
    * duplicate-insensitive) — the KMV gates' hashes pin the replan.
    */
  private def kminSet(h: Column, k: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.plans.KMinSetAgg(
        org.apache.spark.sql.GraftSqlBridge.expression(h), k)
        .toAggregateExpression())

  /** Per-group k-min trim as ROWS (`__g`, `__h`) — the sketch pass
    * shared by the overlap matrix, the streaming KMV per-batch delta
    * trim and the KMV store rebuild
    * ([[graft.streaming.EventStreams.runKmvAppendOnce]] /
    * `rebuildKmvStore`). Null hashes carry no identity and are
    * dropped.
    */
  private[graft] def kminTrim(hashed: DataFrame, k: Int): DataFrame =
    hashed.select(col("__g"), col("__h"))
      .filter(col("__h").isNotNull)
      .groupBy(col("__g"))
      .agg(kminSet(col("__h"), k).as("__ks"))
      .select(col("__g"), explode(col("__ks")).as("__h"))

  private[graft] def kmvFromHashes(hashed: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2: $k")
    hashed.filter(col("__h").isNotNull)
      .groupBy(col(groupCol))
      .agg(kminSet(col("__h"), k).as("__ks"))
      // __hk = the k-th (largest kept) order statistic, __n = kept
      // count — the same two figures the old window cut aggregated
      .select(col(groupCol),
        element_at(col("__ks"), size(col("__ks"))).as("__hk"),
        size(col("__ks")).as("__n"))
      // UNROUNDED: (k−1)·2^60 is exactly representable (k−1 fits the
      // significand), the int64 h_(k) converts to double by one
      // round-to-nearest, and the single IEEE divide is deterministic —
      // so the estimate reproduces bit-for-bit in any engine from the
      // same integer order statistic; rounding would only add a
      // boundary-straddle hazard (the r12 ADVICE seam)
      .select(col(groupCol),
        when(col("__n") < k, col("__n").cast("double"))
          .otherwise(lit((k - 1).toDouble * math.pow(2, 60)) / col("__hk"))
          .as("est_distinct"))
  }

  /** KMV set-operation algebra (Beyer et al. 2007, §5): estimate the
    * UNION size, JACCARD similarity, and INTERSECTION size of two value
    * sets from their k-minimum-value sketches alone — the "how much
    * does the new crawl overlap the existing corpus" monitor, priced at
    * two k-row sketches instead of a cross-corpus join. The k smallest
    * hashes of A∪B form a valid KMV sketch of the union (k-min is
    * associative), and any union-k-min hash belonging to A∩B is
    * necessarily inside BOTH side sketches (its rank within each side
    * is ≤ its union rank ≤ k), so the fraction of union-k-min hashes
    * flagged in both sides is the classic Jaccard estimator;
    * intersection = jaccard · union. Degenerate exactness: when the
    * union keeps fewer than k distinct hashes the sketch IS the union —
    * union and intersection publish as exact counts.
    *
    * Engine-portable like [[kmvDistinct]]: md5-prefix hashes, integer
    * counts, and the published doubles are single deterministic IEEE
    * expressions ((k−1)·2^60/h_(k); n_both/n_kept; their product), so a
    * second engine hash-matches the ESTIMATES (x_distinct_overlap).
    *
    * Scale shape: each side is ONE bounded map-side k-min aggregate
    * ([[graft.plans.KMinSetAgg]] — ≤ k longs per partition reach the
    * single merge; never a corpus-wide distinct shuffle); the union
    * re-cut and flags run over ≤ 2k rows. Null values carry no
    * identity and are dropped.
    *
    * Output: one row — (n_kept, n_both, est_union, jaccard_est,
    * est_intersect).
    */
  def kmvOverlap(a: DataFrame, b: DataFrame, valueCol: Column,
      k: Int): DataFrame =
    kmvOverlapFromHashes(
      a.select(PortableHash.md5Prefix15(valueCol).as("__h")),
      b.select(PortableHash.md5Prefix15(valueCol).as("__h")), k)

  /** The estimator over already-hashed sides (`__h` rows — e.g. the
    * per-batch-trimmed deltas of two streamed KMV stores: k-min is
    * associative, so re-minimizing each side's union of batch trims
    * yields the side's exact one-shot sketch, and the overlap
    * estimates from the summed stores equal the batch estimates
    * bit-for-bit — x_stream_distinct_overlap pins it).
    */
  def kmvOverlapFromHashes(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2: $k")
    // one bounded map-side aggregate per side (≤ k longs per partition
    // reach the single merge — [[kminSet]]), exploded back to ≤ k rows;
    // replaces a corpus-wide distinct + global TakeOrdered per side
    def kmin(df: DataFrame): DataFrame = df
      .select(col("__h"))
      .filter(col("__h").isNotNull)
      .agg(kminSet(col("__h"), k).as("__ks"))
      .select(explode(col("__ks")).as("__h"))
    val ha = kmin(a).withColumn("__ina", lit(1L))
    val hb = kmin(b).withColumn("__inb", lit(1L))
    ha.join(hb, Seq("__h"), "full")
      .select(col("__h"), coalesce(col("__ina"), lit(0L)).as("__ina"),
        coalesce(col("__inb"), lit(0L)).as("__inb"))
      .orderBy(col("__h")).limit(k)
      .agg(count(lit(1)).as("n_kept"), max(col("__h")).as("__hk"),
        sum(when(col("__ina") === 1 && col("__inb") === 1, 1L)
          .otherwise(0L)).as("n_both"))
      .select(overlapEstimates(k): _*)
  }

  /** The estimator epilogue shared by [[kmvOverlap]] and
    * [[kmvOverlapMatrix]], over (n_kept, __hk, n_both) plus any leading
    * key columns already on the frame.
    */
  private def overlapEstimates(k: Int)
      : Seq[Column] = {
    val estUnion = lit((k - 1).toDouble * math.pow(2, 60)) / col("__hk")
    val jac = col("n_both").cast("double") / col("n_kept")
    Seq(col("n_kept"), col("n_both"),
      when(col("n_kept") < k, col("n_kept").cast("double"))
        .otherwise(estUnion).as("est_union"),
      when(col("n_kept") === 0, lit(0.0)).otherwise(jac).as("jaccard_est"),
      when(col("n_kept") < k, col("n_both").cast("double"))
        .otherwise(jac * estUnion).as("est_intersect"))
  }

  /** The ALL-PAIRS form of [[kmvOverlap]]: one k-min sketch per group,
    * then every group pair's union/Jaccard/intersection estimates from
    * the sketches alone — the corpus-overlap MATRIX a multi-source
    * training pipeline reviews before mixing, priced at one sketch
    * pass + a (groups²·k)-bounded epilogue instead of the quadratic
    * cross-source joins the exact form needs (`x_dedup_matrix` stays
    * the exact companion; this is the one that still runs when every
    * source is 100 TB). Same estimator algebra and degenerate-exactness
    * rule as the pairwise form, per pair.
    *
    * Output: (group_a, group_b, n_kept, n_both, est_union, jaccard_est,
    * est_intersect), one row per unordered pair (a < b by group value).
    */
  def kmvOverlapMatrix(df: DataFrame, groupCol: String, valueCol: Column,
      k: Int): DataFrame =
    kmvOverlapMatrixFromHashes(
      df.select(col(groupCol).as("__g"),
        PortableHash.md5Prefix15(valueCol).as("__h")), k)

  /** The matrix over already-hashed (`__g`, `__h`) rows — e.g. the
    * per-group deltas of a streamed KMV store (k-min associativity
    * again: each group's union of batch trims re-minimizes to its
    * exact one-shot sketch, so the streamed matrix equals the batch
    * matrix bit-for-bit — x_stream_overlap_matrix pins it).
    */
  def kmvOverlapMatrixFromHashes(hashed: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2: $k")
    import org.apache.spark.sql.expressions.Window
    // one sketch pass: per-group k smallest distinct hashes via the
    // bounded map-side aggregate ([[kminSet]] — the exchange carries
    // ≤ groups·k·partitions rows; the old distinct + per-group
    // row_number sorted the corpus's near-unique hashes)
    val s = kminTrim(hashed, k)
      .localCheckpoint(eager = true) // pair list + per-pair items share it
    // the pair frame is groups² — broadcast both (groups ≪ corpus)
    val gs = s.select(col("__g")).distinct()
    val pairs = gs.select(col("__g").as("group_a"))
      .join(gs.select(col("__g").as("group_b")),
        col("group_a") < col("group_b"))
    // per-pair union items: each pair pulls its two sketches through
    // two broadcast HASH equi-joins (an OR condition here would be a
    // nested loop — groups³·k comparisons; this shape is groups²·k
    // rows); a hash in both sketches arrives twice and folds into one
    // flagged row
    val items = pairs
      .join(broadcast(s), col("__g") === col("group_a"))
      .select(col("group_a"), col("group_b"), col("__h"),
        lit(1L).as("__a0"), lit(0L).as("__b0"))
      .unionByName(pairs
        .join(broadcast(s), col("__g") === col("group_b"))
        .select(col("group_a"), col("group_b"), col("__h"),
          lit(0L).as("__a0"), lit(1L).as("__b0")))
      .groupBy(col("group_a"), col("group_b"), col("__h"))
      .agg(max(col("__a0")).as("__ina"), max(col("__b0")).as("__inb"))
    val wp = Window.partitionBy(col("group_a"), col("group_b"))
      .orderBy(col("__h"))
    items.withColumn("__rn", row_number().over(wp))
      .filter(col("__rn") <= k)
      .groupBy(col("group_a"), col("group_b"))
      .agg(count(lit(1)).as("n_kept"), max(col("__h")).as("__hk"),
        sum(when(col("__ina") === 1 && col("__inb") === 1, 1L)
          .otherwise(0L)).as("n_both"))
      .select(col("group_a") +: col("group_b") +: overlapEstimates(k): _*)
  }
}
