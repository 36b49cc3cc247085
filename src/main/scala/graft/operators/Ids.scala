package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed deterministic id assignment.
  *
  * `row_number()` over an un-partitioned window funnels the whole dataset
  * through ONE task — the classic scale-killer. The zipWithIndex-style
  * two-phase pattern here keeps the sort distributed:
  *
  *   1. range-repartition on the order keys (global order across partition
  *      ids; equal keys land in the same partition, so the result is
  *      deterministic given a total order),
  *   2. per-partition `row_number` + a prefix-sum of partition counts
  *      (one tiny count job — ≤ numShufflePartitions rows reach the
  *      driver, never data).
  *
  * Equivalent to `row_number() OVER (ORDER BY order…)` for a total order.
  */
object Ids {

  /** Add `idCol` = 1-based global rank by `order` (must be a total order
    * for full determinism). Distributed: no single-task global sort.
    *
    * The range-partitioned input is `localCheckpoint`ed (lineage CUT, not
    * cached) because the offsets are computed against THAT
    * materialization: RangePartitioner samples to pick boundaries, so a
    * from-scratch recomputation could place boundary keys differently
    * while the stale offsets map still resolved — silently duplicating /
    * skipping ids. With the lineage cut, losing the checkpointed blocks
    * (executor failure) FAILS the job loudly instead; cluster runs needing
    * fault tolerance should set a reliable `checkpoint()` dir. Blocks are
    * released by the ContextCleaner when the frame is GC'd.
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column], idCol: String): DataFrame = {
    val Pid = "__gid_pid"
    val ranged = df.repartitionByRange(order: _*)
      .withColumn(Pid, spark_partition_id())
      .localCheckpoint(eager = true)
    // partition COUNTS only — bounded by the shuffle-partition count
    val counts = ranged.groupBy(col(Pid)).agg(count(lit(1)).as("__cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets: Map[Int, Long] = counts.map { case (pid, cnt) =>
      val entry = (pid, acc); acc += cnt; entry
    }.toMap
    val w = Window.partitionBy(col(Pid)).orderBy(order: _*)
    val offset =
      if (offsets.isEmpty) lit(0L)
      else element_at(typedlit(offsets), col(Pid))
    ranged
      .withColumn(idCol, offset + row_number().over(w).cast("long"))
      .drop(Pid)
  }

  /** Add `outCol` = EXCLUSIVE prefix sum of `value` over the total order
    * `order` (the sum of all values strictly before the row; first row
    * gets 0) — `sum() OVER (ORDER BY … ROWS BETWEEN UNBOUNDED PRECEDING
    * AND 1 PRECEDING)` without the single-task global window. Same
    * two-phase shape as `globalRowNumber` (and the same lineage-cut
    * rationale): range partition on the order keys, per-partition window
    * sum, per-partition TOTALS (≤ shuffle-partition-count rows, never
    * data) prefix-summed on the driver into offsets.
    *
    * Null `value`s (including values whose long cast nulls out) contribute
    * 0 — both in the per-partition totals (coalesced, so an all-null
    * partition is a 0 offset, not a driver NPE) and in the within-partition
    * window sum (SQL sum skips nulls) — so every row still gets a defined
    * prefix over the total order.
    */
  def globalPrefixSum(df: DataFrame, order: Seq[Column], value: Column,
      outCol: String): DataFrame = {
    val Pid = "__gps_pid"
    val V = "__gps_v"
    val ranged = df.withColumn(V, value.cast("long"))
      .repartitionByRange(order: _*)
      .withColumn(Pid, spark_partition_id())
      .localCheckpoint(eager = true)
    val sums = ranged.groupBy(col(Pid))
      .agg(coalesce(sum(col(V)), lit(0L)).as("__s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets: Map[Int, Long] = sums.map { case (pid, s) =>
      val entry = (pid, acc); acc += s; entry
    }.toMap
    val w = Window.partitionBy(col(Pid)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offset =
      if (offsets.isEmpty) lit(0L)
      else element_at(typedlit(offsets), col(Pid))
    ranged
      .withColumn(outCol, offset + coalesce(sum(col(V)).over(w), lit(0L)))
      .drop(Pid, V)
  }
}
