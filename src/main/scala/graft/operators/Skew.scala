package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols.qcol

/** Skew-mitigation utilities.
  *
  * AQE's skew-join handling (on by default in Spark 4) covers sort-merge
  * joins; explicit salting remains the tool for skewed AGGREGATIONS and for
  * joins where one hot key would otherwise pin a single task at 100 TB
  * (SURVEY §4.2 + the scale brief). Both transforms are deterministic:
  * the salt derives from content hashes, not rand().
  */
object Skew {

  /** Join a skewed large frame to a small frame on `key`, spreading each
    * hot key across `salt` partitions: the large side gets a content-hash
    * salt, the small side is replicated `salt` times. Result equals the
    * plain inner/left join.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      salt: Int,
      joinType: String = "inner",
  ): DataFrame = {
    require(salt > 0)
    // deterministic per-row salt: hash of the whole row spreads a hot key's
    // rows uniformly without rand()'s re-execution hazards
    val saltCol = pmod(xxhash64(large.columns.map(qcol): _*), lit(salt))
    val l = large.withColumn("__salt", saltCol)
    val s = small.withColumn("__salt", explode(sequence(lit(0L), lit(salt - 1L))))
    l.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase (partial + final) aggregation for skewed group keys:
    * aggregate per (key, salt) first, then combine. `partial` builds the
    * salted-level aggregates, `combine` merges them — e.g. count: partial
    * count(1) → combine sum.
    */
  def saltedAgg(
      df: DataFrame,
      key: String,
      salt: Int,
      partial: Seq[Column],
      combine: Seq[Column],
  ): DataFrame = {
    require(salt > 0)
    val saltCol = pmod(xxhash64(df.columns.map(qcol): _*), lit(salt))
    df.withColumn("__salt", saltCol)
      .groupBy(qcol(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(qcol(key))
      .agg(combine.head, combine.tail: _*)
  }
}
