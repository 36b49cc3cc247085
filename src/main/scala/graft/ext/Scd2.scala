package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history building: collapse an
  * append-only observation log into per-key validity intervals — the
  * warehouse-standard "effective from/to" dimension shape, and the batch
  * complement of the CDC surface ([[graft.operators.Upsert.snapshotDiff]]
  * answers "what changed between two snapshots"; this answers "what was
  * true when").
  *
  * Scale shape: one hash shuffle of the log on the key plus one
  * spilling sort per partition (the `sessionizeBatch`/`asofJoin` cost
  * class) — run detection is a `lag` + running-sum over that single
  * sorted window, interval assembly one partial-aggregated group-by,
  * and the `valid_to` chain a second window over RUNS (intervals-sized,
  * far smaller than the log). No pair blow-up anywhere; a hot key is
  * one big sort run, not an OOM.
  */
object Scd2 {

  /** Collapse consecutive runs of an equal `attr` value per key into
    * validity intervals.
    *
    * Input rows are ordered per key by (`ts`, `tie`) — pass a unique
    * tiebreaker (an event id) so the run structure is deterministic
    * under equal timestamps. Output: one row per maximal run,
    *
    *   (key, attr, valid_from, valid_to, n_rows, is_current)
    *
    * with `valid_from` = the run's first observation time, `valid_to` =
    * the NEXT run's `valid_from` (null on the key's current run — the
    * half-open `[from, to)` convention, adjacent intervals tile), and
    * `n_rows` = observations collapsed into the run. Null `attr`
    * observations follow the SQL three-valued reading of
    * `prev IS NULL OR prev <> attr` exactly (a null observation
    * attaches to the preceding run and the next non-null observation
    * opens a fresh one) — identical in the DuckDB replay; feed
    * `coalesce(attr, sentinel)` if nulls should be their own dimension
    * value.
    */
  def intervals(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      attrCol: String): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val marked = df
      .select(col(keyCol), col(tsCol), col(tieCol), col(attrCol))
      .withColumn("__prev", lag(col(attrCol), 1).over(wOrd))
      .withColumn("__chg",
        when(col("__prev").isNull || col("__prev") =!= col(attrCol), 1)
          .otherwise(0))
      .withColumn("__run", sum(col("__chg"))
        .over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = marked.groupBy(col(keyCol), col("__run"))
      .agg(min(col(attrCol)).as(attrCol), // constant within a run
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_rows"))
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col("__run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__run")
      .select(col(keyCol), col(attrCol), col("valid_from"), col("valid_to"),
        col("n_rows"), col("is_current"))
  }

  /** Point-in-time (time-travel) read of an [[intervals]] history: the
    * one row per key whose half-open `[valid_from, valid_to)` interval
    * contains `ts` — "what did the dimension say at T". Keys first
    * observed after `ts` produce no row (they did not exist yet). A
    * pushed-down filter over the history table — no join, no window;
    * on a `valid_from`-partitioned history the scan prunes to the
    * prefix ≤ T.
    */
  def asOf(intervals: DataFrame, ts: Column): DataFrame =
    intervals.filter(col("valid_from") <= ts &&
      (col("valid_to").isNull || ts < col("valid_to")))
}
