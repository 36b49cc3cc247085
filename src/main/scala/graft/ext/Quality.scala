package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols.qcol

/** Declarative data-quality expectations — the contract-check pass a
  * pipeline runs before publishing a table (the Deequ/Great-Expectations
  * shape, Spark-native): a named list of row predicates evaluated in ONE
  * aggregate scan, plus a referential-integrity check as a broadcast
  * anti-join, each reporting violation counts rather than failing fast —
  * the report is the artifact; a gate then decides.
  *
  * Scale shape: `expectations` is a single full scan with map-side
  * combined counter aggregates (adding rules adds counters, not passes);
  * `referentialViolations` broadcasts the DIMENSION key set (referential
  * checks against another FACT table should flip fact/dim or use a
  * shuffle join — the broadcast here is the dim-sized contract this
  * helper names).
  */
object Quality {

  /** Evaluate `rules` (name → predicate that must hold per row) in one
    * scan. A predicate evaluating to NULL counts as a violation — an
    * expectation you cannot prove held, didn't (the conservative
    * reading; wrap in `coalesce(pred, lit(true))` to opt out per rule).
    *
    * Output: (`rule`, `violations`, `n_rows`, `pass`), one row per rule
    * in input order.
    */
  def expectations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "no expectations given")
    // coalesce: sum over ZERO rows is NULL — an empty input must report
    // 0 violations / pass = true, not an indeterminate NULL contract
    val aggs = rules.zipWithIndex.map { case ((_, p), i) =>
      coalesce(sum(when(coalesce(p, lit(false)), 0L).otherwise(1L)), lit(0L))
        .as(s"__v$i")
    }
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(col("__n"), explode(array(rules.zipWithIndex.map {
        case ((name, _), i) =>
          struct(lit(name).as("rule"), col(s"__v$i").as("violations"))
      }: _*)).as("__e"))
      .select(col("__e.rule").as("rule"), col("__e.violations").as("violations"),
        col("__n").as("n_rows"), (col("__e.violations") === 0L).as("pass"))
  }

  /** Referential integrity as an expectation row: count of `df` rows
    * whose `fkCol` is non-null but absent from `dim`'s `pkCol` (null FKs
    * are the not-null rule's business, not dangling references).
    * Output shape matches [[expectations]].
    */
  def referentialViolations(df: DataFrame, fkCol: String, dim: DataFrame,
      pkCol: String, rule: String): DataFrame = {
    val orphans = df.select(qcol(fkCol).as("__fk"))
      .filter(col("__fk").isNotNull)
      .join(broadcast(dim.select(qcol(pkCol).as("__fk")).distinct()),
        Seq("__fk"), "left_anti")
    val n = df.agg(count(lit(1)).as("__n"))
    orphans.agg(count(lit(1)).as("violations"))
      .crossJoin(broadcast(n))
      .select(lit(rule).as("rule"), col("violations"),
        col("__n").as("n_rows"), (col("violations") === 0L).as("pass"))
  }
}
