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

  /** Weighted dataset mixing — the "web at 30%, books at 100%, forums at
    * 5%" recipe of a training-data mix: each stratum keeps its own
    * fraction, decided per row from the same salted content hash as
    * `stratifiedHashSample` (deterministic, engine-replayable, map-only).
    * Rows whose stratum is absent from `weights` drop (their threshold is
    * the empty string, below every digest).
    */
  def weightedMix(
      df: DataFrame, stratum: Column, key: Column, weights: Map[String, Double],
  ): DataFrame = {
    val thr = weights.foldLeft(lit("")) { case (acc, (s, rate)) =>
      when(stratum.cast("string") === s, lit(rateToHex(rate))).otherwise(acc)
    }
    df.filter(md5(concat(stratum.cast("string"), lit(":"), key.cast("string"))) < thr)
  }
}
