package graft.streaming

import org.apache.spark.sql.SparkSession

/** Scoped shuffle-width override shared by every one-shot streaming run.
  *
  * Per-micro-batch work in these runs is batch-sized, but the FIXED cost
  * per batch scales with the shuffle width twice over: each stateful
  * operator pays one state-store commit (delta file + fsync, or a RocksDB
  * checkpoint upload) PER STATE PARTITION PER BATCH, and each foreachBatch
  * shuffle emits one output file per task. At the session's analytics
  * width (32) a six-batch stateful gate pays ~200 metadata commits for
  * kilobytes of state — the measured dominator of streaming-gate wall
  * time on a slow filesystem. A real deployment sizes its stream job's
  * width once at startup; these self-contained runs narrow it for the
  * run's duration and restore the session default after.
  */
private[graft] object StreamConf {
  def withWidth[T](spark: SparkSession, width: Int = 4)(f: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", width.toString)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
