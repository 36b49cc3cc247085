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
}
