package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout management — the table-maintenance operators a
  * 100 TB lakehouse actually runs nightly: multi-dimensional z-order
  * clustering (so min/max file statistics prune scans on EITHER
  * predicate column, not just the sort leader) and small-file
  * compaction (so a streaming sink's thousand 2 MB files become a
  * scan-friendly handful).
  */
object Layout {

  /** Z-order (Morton) interleave of two non-negative integer columns,
    * `bits` bits each: bit b of x lands at position 2b, bit b of y at
    * 2b+1, so sorting by the result interleaves the two dimensions and
    * any contiguous z-range covers a bounded rectangle of (x, y) — the
    * property that makes per-file min/max stats selective on both
    * columns. Pure codegen'd bitwise built-ins (2·bits shift/and/or
    * terms, constant-folded offsets), engine-portable:
    * `sum(((x>>b)&1)*2^(2b) + ((y>>b)&1)*2^(2b+1))` replays it in SQL.
    * Inputs must be in [0, 2^bits); out-of-range bits are simply not
    * examined (values hash into the same curve cell as their low bits —
    * callers mod/bucket first, which is also what keeps the curve
    * dense).
    */
  def zOrder2(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31]: $bits")
    (0 until bits).map { b =>
      shiftleft(shiftright(x.cast("long"), b).bitwiseAND(1), 2 * b)
        .bitwiseOR(shiftleft(shiftright(y.cast("long"), b).bitwiseAND(1), 2 * b + 1))
    }.reduce((a, c) => a.bitwiseOR(c))
  }

  /** Rewrite `df` clustered on the z-curve of two dimension columns:
    * range-partition on the z-value (each output file owns a contiguous
    * z-range ⇒ a bounded rectangle of both dims), sort within
    * partitions (parquet row-group stats get the same locality), write
    * `files` parquet files. The write is the one shuffle; queries then
    * prune by footer stats forever after — the classic
    * write-once/scan-many trade.
    */
  def clusterByZOrder(df: DataFrame, xCol: Column, yCol: Column, bits: Int,
      dst: String, files: Int): Unit = {
    require(files > 0, s"files must be positive: $files")
    df.withColumn("__z", zOrder2(xCol, yCol, bits))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dst)
  }

  /** Compact a fragmented parquet table to ~`targetBytes` per output
    * file: measure the actual on-disk footprint, round-robin
    * `repartition` to the implied file count (even file sizes — a
    * `coalesce` would skip the shuffle but inherit the input's skew,
    * and a compaction that writes one giant and many tiny files has
    * not compacted), rewrite to `dst`. Returns the file count chosen.
    * Content is preserved row-for-row (the roundtrip gate hash-matches
    * it); only the physical layout changes.
    */
  def compactParquet(spark: SparkSession, src: String, dst: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val path = new org.apache.hadoop.fs.Path(src)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(path).getLength
    val files = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(src).repartition(files)
      .write.mode("overwrite").parquet(dst)
    files
  }
}
