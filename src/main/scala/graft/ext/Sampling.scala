package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols.qcol

/** Deterministic sampling for training-data pipelines.
  *
  * `rand()`-based sampling is irreproducible across runs/partitionings and
  * unverifiable across engines; hash sampling decides per ROW from a
  * content key, so the sample is stable under re-partitioning, retries,
  * incremental reprocessing — and replayable by any engine with the same
  * hash (the DuckDB oracle replays it with its own md5). A narrow map-only
  * filter: no shuffle, no RNG state, 100 TB-safe by construction.
  */
object Sampling {

  /** Keep rows whose `md5(key)` hex digest sorts below `thresholdHex`
    * (lexicographic compare on lowercase hex — identical in Spark and
    * DuckDB). A one-digit threshold "4" keeps 4/16 = 25%; "8" keeps 50%;
    * two digits refine to 1/256 granularity ("1a" ≈ 10.2%).
    */
  def hashSample(df: DataFrame, key: Column, thresholdHex: String): DataFrame = {
    require(thresholdHex.nonEmpty && thresholdHex.forall(c =>
      c.isDigit || ('a' to 'f').contains(c)), s"not a lowercase hex prefix: $thresholdHex")
    df.filter(md5(key.cast("string")) < lit(thresholdHex))
  }

  /** Stratified variant: the stratum value is salted into the hash key, so
    * each stratum is sampled independently at the same rate (a hot stratum
    * cannot crowd out rare ones the way a global sort-by-hash-take-N
    * would).
    */
  def stratifiedHashSample(
      df: DataFrame, stratum: Column, key: Column, thresholdHex: String,
  ): DataFrame =
    hashSample(df, concat(stratum.cast("string"), lit(":"), key.cast("string")),
      thresholdHex)

  /** Exactly-k-per-stratum deterministic sample (the balanced-subset
    * shape: k docs per source/domain/language regardless of stratum
    * size): rank each stratum by md5 of the salted key — content-keyed,
    * so reruns and engines agree row for row, unlike `TABLESAMPLE` —
    * and keep the first `k`. One key-partitioned window over the
    * (stratum, key) pairs; a stratum smaller than `k` keeps everything.
    */
  def stratifiedTopK(df: DataFrame, stratum: Column, key: Column,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(stratum)
      .orderBy(md5(concat(stratum.cast("string"), lit(":"),
        key.cast("string"))), key)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Leakage-safe train/eval split: rows whose `groupCol` matches (e.g.
    * exact-duplicate text, a URL/domain, a near-dup cluster label from
    * [[Dedup.connectedComponents]]) ALWAYS land in the same split — the
    * split hash is taken on the group's canonical member (min id), not
    * the row, so a document's duplicates can never leak across the
    * boundary (the classic eval-contamination path a row-level random
    * split walks straight into). Null groups are their own singleton
    * groups (null text is no evidence of duplication — the
    * x_dedup_resolve discipline).
    *
    * One window over the group key (a hash shuffle + per-partition sort;
    * key the window on a fingerprint of the text at corpus scale rather
    * than the raw string) and a deterministic md5 threshold — no RNG, so
    * reruns, retries and both engines agree row for row.
    *
    * Output: the input plus a `split` column ('train' | 'test').
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, groupCol: Column,
      trainRate: Double): DataFrame = {
    val canon = when(groupCol.isNull, col(idCol).cast("long"))
      .otherwise(min(col(idCol).cast("long"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(groupCol)))
    df.withColumn("split",
      when(md5(canon.cast("string")) < lit(rateToHex(trainRate)), "train")
        .otherwise("test"))
  }

  /** Fractional rate → 8-hex-digit threshold for the lexicographic md5
    * compare: keeps exactly floor(rate·2³²)/2³² of a uniform hash space
    * (resolution ~2.3e-10). Rate 1.0 maps to "g", which sorts above every
    * hex digest — keep-all without a special case in the predicate.
    */
  def rateToHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate outside [0,1]: $rate")
    if (rate >= 1.0) "g"
    else f"${math.floor(rate * 4294967296.0).toLong}%08x"
  }

  /** Temperature-weighted mixing (the mT5/multilingual-sampling recipe):
    * stratum s keeps rows at a rate making its expected share of the kept
    * corpus ∝ n_s^alpha — alpha = 1 preserves natural proportions,
    * alpha → 0 flattens toward uniform-per-stratum, in between
    * upweights rare strata relative to their size. `targetFraction`
    * scales the expected TOTAL kept to that fraction of the corpus;
    * per-stratum rates cap at 1 (a filter cannot upsample — a rare
    * stratum the formula would oversample is simply kept whole).
    *
    * rate_s = min(1, N·targetFraction · (n_s^alpha / Σ_t n_t^alpha) / n_s)
    *
    * One bounded aggregate (one row per stratum — collected, like every
    * bounded driver read in this codebase) computes the counts; the
    * per-row decision is then the same salted-md5 threshold as
    * [[weightedMix]] — deterministic and engine-replayable. alpha = 0.5
    * uses `sqrt` (correctly rounded under IEEE-754, so an external
    * engine recomputing the rates gets bit-identical thresholds);
    * other alphas go through `pow`, whose last-ulp behavior is libm-
    * specific — fine for production, but pin 0.5 where a foreign engine
    * must replay the exact row set.
    */
  /** TOKEN-budget mixing — the unit curation actually budgets in: per
    * source, admit documents in a deterministic md5 shuffle order until
    * the source's cumulative TOKEN count would exceed `budget` (a doc
    * that crosses the line is excluded; sources under budget keep
    * everything). Row-count mixes ([[weightedMix]] and friends)
    * over-weight long-document sources; training corpora are specified
    * as "N billion tokens of X", which is this cut.
    *
    * Deterministic and engine-replayable: the order key is
    * md5(key) (hex string order, ties by the key itself), the token
    * count is [[TextAnalysis.tokenCount]], and the running sum is a
    * per-source window — one key shuffle + per-partition sort, the
    * sessionize cost class. Output: the admitted rows of `df`.
    */
  /** Budget-calibrated filtering: keep EXACTLY ⌊frac·n⌋ rows — the top
    * fraction under the total order (score DESC, id ASC) — without a
    * global sort. The operation a token-budget-constrained curation
    * pass runs ("keep the best quarter"): a fixed score threshold
    * either over- or under-shoots the budget as the corpus drifts;
    * calibrating the threshold FROM the corpus hits it exactly.
    *
    * Scale shape (no corpus-wide window, no single-task sort anywhere):
    * one group-by builds the score histogram (score-cardinality-sized),
    * a DISTRIBUTED cumulative sum over the sorted histogram
    * ([[graft.operators.Ids.globalPrefixSum]]: range partition +
    * per-partition window + driver offsets over partition-count totals)
    * finds the threshold score `t` and the tie budget `r`; one corpus
    * scan keeps `score > t` outright, and a window PARTITIONED BY SCORE
    * ranks only the `score == t` tie group to take its `r` smallest
    * ids. `scoreCol` should be integer-valued (quantize floats first —
    * the library's fixed-point discipline) so the histogram and the
    * tie semantics are exact; a continuous score still computes the
    * same answer, through a row-sized histogram that the two-phase
    * prefix sum keeps distributed.
    *
    * Returns the input columns plus `kept` (boolean) — callers filter
    * or audit; the kept count is exactly ⌊frac·n⌋ (0 ≤ frac ≤ 1).
    */
  def keepTopFraction(df: DataFrame, scoreCol: Column, idCol: String,
      frac: Double): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac out of [0,1]: $frac")
    // null scores sort LAST (below every real score): without this, a
    // threshold landing in the null group would make every comparison
    // null and silently keep nothing — the budget must stay exact even
    // on a corpus whose scorer has gaps
    val scored = df.withColumn("__s",
      coalesce(scoreCol.cast("long"), lit(Long.MinValue)))
      .localCheckpoint(eager = true) // histogram + final scan
    val n = scored.count()
    val k = math.floor(frac * n).toLong
    if (k == 0L) return scored.withColumn("kept", lit(false)).drop("__s")
    // histogram, descending cumulative counts — score-cardinality-sized
    // in the QUANTIZED contract, but nothing enforces quantization, so
    // the cumulative sum runs through the two-phase distributed prefix
    // machinery (range partition + per-partition window + driver
    // offsets over ≤ partition-count totals) instead of an
    // unpartitioned ORDER BY window: a caller passing a continuous
    // score gets a row-sized histogram, which must not become a
    // single-task global sort
    val hist = scored.groupBy(col("__s")).agg(count(lit(1)).as("__c"))
    val cum = graft.operators.Ids.globalPrefixSum(
        hist, Seq(col("__s").desc), col("__c"), "__pre")
      .withColumn("__cum", col("__pre") + col("__c"))
    // threshold row: the highest score whose cumulative count reaches k
    val thr = cum.filter(col("__cum") >= k)
      .orderBy(col("__s").desc).limit(1)
      .select(col("__s").as("__t"),
        (lit(k) - col("__pre")).as("__r"))
      .head()
    val (t, r) = (thr.getLong(0), thr.getLong(1))
    // ties at the threshold rank within their own score partition —
    // a key-partitioned window, never a global sort
    val tieW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__s")).orderBy(qcol(idCol))
    scored.withColumn("__tr",
        when(col("__s") === t, row_number().over(tieW)).otherwise(lit(0)))
      .withColumn("kept",
        col("__s") > t || (col("__s") === t && col("__tr") <= r))
      .drop("__s", "__tr")
  }

  def tokenBudgetMix(df: DataFrame, sourceCol: Column, textCol: Column,
      key: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__src"))
      .orderBy(col("__ord"), col("__key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__src", sourceCol)
      .withColumn("__key", key.cast("string"))
      .withColumn("__ord", md5(col("__key")))
      .withColumn("__tok", TextAnalysis.tokenCount(textCol).cast("long"))
      .withColumn("__cum", sum(col("__tok")).over(w))
      .filter(col("__cum") <= budget)
      .drop("__src", "__key", "__ord", "__tok", "__cum")
  }

  def temperatureMix(
      df: DataFrame, stratum: Column, key: Column,
      alpha: Double = 0.5, targetFraction: Double = 0.5,
  ): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha outside (0,1]: $alpha")
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction outside (0,1]: $targetFraction")
    // the collect is bounded by STRATUM CARDINALITY (sources/languages/
    // domains-class columns, not row-proportional); a mistaken
    // high-cardinality stratum (e.g. a document id) must fail loudly,
    // not OOM the driver. weightedMix's map-literal threshold holds any
    // cardinality this cap admits (~a few MB of driver rows at the cap —
    // per-domain mixing at 10k-100k strata is in range; a document id
    // is not).
    val maxStrata = 100000
    val countsDf = df.groupBy(stratum.cast("string").as("__s"))
      .agg(count(lit(1)).as("__n"))
      .limit(maxStrata + 1)
    val rows = countsDf.collect()
    require(rows.length <= maxStrata,
      s"temperatureMix stratum column has > $maxStrata distinct values — " +
        "that is a key, not a stratum; mix on a bounded column")
    // null strata drop, matching weightedMix (their threshold would be
    // the empty string anyway — and a null must not NPE the rate math)
    val counts = rows.filter(!_.isNullAt(0))
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1) // deterministic float-sum order
    require(counts.nonEmpty, "temperatureMix: no non-null strata")
    def p(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
    val z = counts.map { case (_, n) => p(n) }.sum
    val total = counts.map(_._2).sum.toDouble * targetFraction
    // operation ORDER mirrors the SQL oracle exactly: total * (p/z) / n
    val weights = counts.map { case (s, n) =>
      s -> math.min(1.0, total * (p(n) / z) / n.toDouble)
    }.toMap
    weightedMix(df, stratum, key, weights)
  }

  /** Weighted dataset mixing — the "web at 30%, books at 100%, forums at
    * 5%" recipe of a training-data mix: each stratum keeps its own
    * fraction, decided per row from the same salted content hash as
    * `stratifiedHashSample` (deterministic, engine-replayable, map-only).
    * Rows whose stratum is absent from `weights` (or null) drop — their
    * threshold coalesces to the empty string, below every digest.
    *
    * Threshold lookup by cardinality (same semantics either way):
    *   - ≤ 64 strata: ONE map literal probed with `try_element_at` —
    *     no exchange, the whole mix stays a pushed-down filter. A
    *     literal map probe is a LINEAR key scan (`ArrayBasedMapData`
    *     has no hash index), which is free at source/language-class
    *     cardinality and a per-row disaster at domain-class: measured
    *     24 s for 600k rows × a 12k-entry map.
    *   - above: a BROADCAST HASH JOIN against the weights as a tiny
    *     frame — O(1) per row at any cardinality; unmatched (or null)
    *     strata get a null threshold and drop through the coalesce.
    *     (A per-stratum when-chain — the obvious third spelling —
    *     walks a cardinality-deep expression tree per row and
    *     overflows Catalyst well below 10k branches.)
    */
  def weightedMix(
      df: DataFrame, stratum: Column, key: Column, weights: Map[String, Double],
  ): DataFrame = {
    require(weights.nonEmpty, "weightedMix: empty weights map")
    val pred = (thr: Column) =>
      md5(concat(stratum.cast("string"), lit(":"), key.cast("string"))) < thr
    if (weights.size <= 64) {
      val thrMap = typedLit(weights.map { case (s, rate) => s -> rateToHex(rate) })
      // try_element_at: null on missing key AND on null stratum (ANSI
      // element_at would throw on the first unweighted stratum instead)
      df.filter(pred(coalesce(try_element_at(thrMap, stratum.cast("string")), lit(""))))
    } else {
      val dup = df.columns.toSet.intersect(Set("__wm_s", "__wm_thr"))
      require(dup.isEmpty,
        s"weightedMix reserves column names __wm_s/__wm_thr; rename: ${dup.mkString(", ")}")
      val spark = df.sparkSession
      import spark.implicits._
      val w = weights.toSeq.map { case (s, rate) => (s, rateToHex(rate)) }
        .toDF("__wm_s", "__wm_thr")
      df.join(broadcast(w), stratum.cast("string") === col("__wm_s"), "left")
        .filter(pred(coalesce(col("__wm_thr"), lit(""))))
        .drop("__wm_s", "__wm_thr")
    }
  }

  /** Epoch-based UPSAMPLING — the other half of data mixing beside the
    * down-sampling rates (a filter cannot repeat rows; training mixes
    * routinely specify "source X for 2.5 epochs"): each source slated
    * for `e` epochs contributes ⌊e⌋ full copies plus a deterministic
    * md5-threshold sample of the corpus at rate `e − ⌊e⌋` as the final
    * partial epoch. Every emitted row carries its `epoch` index and a
    * deterministic `order_key` (md5 over epoch:stratum:key) — the
    * reproducible global training-order shuffle, content-keyed so
    * reruns and engines agree row for row and the copies of a document
    * interleave across the order instead of clustering. Sources absent
    * from `epochs` drop (the map IS the mix, the weightedMix
    * convention).
    *
    * Scale shape: one broadcast of the (source, n_epochs, threshold)
    * config, one narrow explode bounded by ⌈e⌉ per row — no shuffle at
    * all; consumers sort by `order_key` only when materializing the
    * final training order (a sort they were paying anyway).
    */
  def epochUpsample(df: DataFrame, stratum: Column, key: Column,
      epochs: Map[String, Double]): DataFrame = {
    require(epochs.nonEmpty, "epochUpsample: empty epochs map")
    epochs.foreach { case (s, e) =>
      require(e > 0.0 && e <= 1000.0, s"epochs out of (0, 1000] for '$s': $e")
    }
    val dup = df.columns.toSet
      .intersect(Set("__eu_s", "__eu_n", "__eu_frac", "epoch", "order_key"))
    require(dup.isEmpty,
      s"epochUpsample reserves column names: rename ${dup.mkString(", ")}")
    val spark = df.sparkSession
    import spark.implicits._
    val cfg = epochs.toSeq.map { case (s, e) =>
      val nFull = math.floor(e).toInt
      val frac = e - nFull
      val hasFrac = frac > 1e-12
      (s, nFull + (if (hasFrac) 1 else 0), if (hasFrac) rateToHex(frac) else "")
    }.toDF("__eu_s", "__eu_n", "__eu_frac")
    val h = (pre: Column) => md5(concat(pre, col("epoch").cast("string"),
      lit(":"), stratum.cast("string"), lit(":"), key.cast("string")))
    df.join(broadcast(cfg), stratum.cast("string") === col("__eu_s"))
      .withColumn("epoch", explode(sequence(lit(0), col("__eu_n") - 1)))
      // full epochs keep everything; the one fractional epoch (always
      // the LAST index, iff a threshold exists) keeps the md5 sample
      .filter(col("epoch") <
          col("__eu_n") - when(col("__eu_frac") =!= "", 1).otherwise(0) ||
        h(lit("")) < col("__eu_frac"))
      .withColumn("order_key", h(lit("o:")))
      .drop("__eu_s", "__eu_n", "__eu_frac")
  }

  // ------------------------------------------------ importance resampling
  /** DSIR-style hashed n-gram importance weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): featurize
    * every document as a bag of hashed 1..n-gram buckets, fit smoothed
    * multinomial bag models on the TARGET corpus (the distribution you
    * want more of) and on the RAW corpus, and weight each raw document by
    * its log-likelihood ratio  logw(x) = Σ_b cnt_b(x)·(log p_t(b) −
    * log p_r(b)).  The bucket is the first `prefixLen` hex chars of
    * md5(gram) — 16^prefixLen buckets, engine-portable (the DuckDB oracle
    * replays the exact weights), content-keyed and therefore stable under
    * repartitioning and incremental reprocessing, like every sampler
    * here.
    *
    * Scale shape: two map-side-combining bucket-count aggregations (the
    * shuffle carries ≤ 16^prefixLen rows, never grams), the log-ratio
    * table broadcast (≤ 16^prefixLen entries), one per-(doc, bucket)
    * aggregate + broadcast join + per-doc sum for the weights — nothing
    * corpus-sized shuffles except the doc-keyed aggregates themselves.
    *
    * Returns one row per raw document: (`idCol`, `logw`), logw = 0.0 for
    * documents with no tokens (an empty bag is evidence for neither
    * distribution).
    */
  def importanceLogWeights(
      raw: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      targetTextCol: String,
      n: Int = 2,
      prefixLen: Int = 3,
      smoothing: Double = 1.0,
  ): DataFrame = {
    require(n >= 1 && prefixLen >= 1 && prefixLen <= 8 && smoothing > 0,
      s"importanceLogWeights: invalid geometry (n=$n, prefixLen=$prefixLen, α=$smoothing)")
    import graft.functions.Cols.qcol
    val dBuckets = math.pow(16, prefixLen)
    // one gram pass over the raw corpus feeds BOTH the corpus bag model
    // and the per-document counts
    // checkpoints are LAZY and the bag-model totals ride the plan as a
    // 1×1 broadcast instead of two blocking .head() scalar pulls: the
    // whole weight pipeline now executes inside the caller's single
    // action (zero driver round trips), with the compute-once block
    // sharing of every multiply-referenced frame intact. The arithmetic
    // is unchanged — the totals are the same longs, promoted to double
    // in the same expressions — so the weights are bit-identical.
    val rawGb = gramBuckets(raw, qcol(idCol), qcol(textCol), n, prefixLen)
      .localCheckpoint(eager = false) // corpus bag model + per-doc counts
    val tgtGb = gramBuckets(target, lit(0L), qcol(targetTextCol), n, prefixLen)
    val rawCounts = rawGb.groupBy(col("__b")).agg(count(lit(1)).as("__rc"))
      .localCheckpoint(eager = false) // consumed by the total AND the join
    val tgtCounts = tgtGb.groupBy(col("__b")).agg(count(lit(1)).as("__tc"))
      .localCheckpoint(eager = false) // consumed by the total AND the join
    val totals = rawCounts
      .agg(coalesce(sum(col("__rc")), lit(0L)).cast("double").as("__nr"))
      .crossJoin(tgtCounts
        .agg(coalesce(sum(col("__tc")), lit(0L)).cast("double").as("__nt")))
    // every raw document's buckets appear in rawCounts by construction,
    // so the raw-side ratio table covers every bucket the weights touch;
    // buckets unseen in the TARGET take the smoothed zero
    val ratio = rawCounts.join(tgtCounts, Seq("__b"), "left")
      .crossJoin(broadcast(totals)) // 1×1: the two bag totals, never data
      .select(col("__b"),
        (log((coalesce(col("__tc"), lit(0L)) + smoothing) / (col("__nt") + smoothing * dBuckets))
          - log((col("__rc") + smoothing) / (col("__nr") + smoothing * dBuckets))).as("__lr"))
    val perDoc = rawGb.groupBy(col("__id"), col("__b"))
      .agg(count(lit(1)).as("__dc"))
      .join(broadcast(ratio), Seq("__b"))
      .groupBy(col("__id"))
      .agg(sum(col("__dc") * col("__lr")).as("logw"))
    raw.select(qcol(idCol).cast("long").as("__rid")).distinct()
      .join(perDoc, col("__rid") === col("__id"), "left")
      .select(col("__rid").as(idCol), coalesce(col("logw"), lit(0.0)).as("logw"))
  }

  /** Importance RESAMPLING on top of [[importanceLogWeights]]: the Gumbel
    * top-k trick (add an independent Gumbel(0,1) to each log-weight, take
    * the k largest) draws k documents WITHOUT replacement with
    * probability proportional to their importance weights — but with the
    * uniforms derived from md5 of the document id instead of an RNG, so
    * the "random" draw is deterministic, stable under repartitioning,
    * and replayable by the DuckDB oracle, exactly like [[hashSample]].
    * Returns (`idCol`, `score`) for the k selected documents, score =
    * round(logw + gumbel, 6), ranked ties broken by id.
    */
  def importanceResample(
      raw: DataFrame,
      idCol: String,
      textCol: String,
      target: DataFrame,
      targetTextCol: String,
      k: Int,
      n: Int = 2,
      prefixLen: Int = 3,
      smoothing: Double = 1.0,
  ): DataFrame = {
    import graft.functions.Cols.qcol
    val w = importanceLogWeights(raw, idCol, textCol, target, targetTextCol,
      n, prefixLen, smoothing)
    // u ∈ (0, 1): the first 8 md5 hex chars as a 32-bit integer, +0.5 to
    // stay strictly inside the interval (log(0) guards); the division by
    // 2³² is exact, so Spark and DuckDB compute bit-identical uniforms
    val u = (conv(substring(md5(qcol(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    val score = round(col("logw") - log(-log(u)), 6)
    // orderBy + limit plans as TakeOrderedAndProject — per-partition
    // top-k folded on the driver, never a single-task global sort
    w.withColumn("__score", score)
      .orderBy(col("__score").desc, qcol(idCol))
      .limit(k)
      .select(qcol(idCol), col("__score").as("score"))
  }

  /** (`__id`, `__b`) rows: one per 1..n-gram instance of each document,
    * bucket = first `prefixLen` hex chars of md5(gram). Documents with
    * no tokens produce no rows.
    */
  private def gramBuckets(df: DataFrame, id: Column, text: Column,
      n: Int, prefixLen: Int): DataFrame = {
    // tokens materialize in their OWN projection: Spark does not CSE
    // duplicated subtrees inside one projection, and the gram expression
    // references the token array ~3n times — inlined, the regex split
    // would re-run per reference per row (measured ~4× the pipeline CPU)
    val toks = col("__tk")
    val grams = flatten(array((1 to n).map { k =>
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(k)))))
        .otherwise(array().cast("array<string>"))
    }: _*))
    df.select(id.cast("long").as("__id"), TextAnalysis.tokens(text).as("__tk"))
      .select(col("__id"), explode(grams).as("__g"))
      .select(col("__id"), substring(md5(col("__g")), 1, prefixLen).as("__b"))
  }
}
