package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
