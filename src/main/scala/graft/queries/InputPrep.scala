package graft.queries

import org.apache.spark.sql.SparkSession

/** Build every /tmp-staged test INPUT once, outside any timed or dumped
  * query: the archives a user would have uploaded, the files a stream
  * would have delivered, the curated bucketed/partitioned/JSONL layouts a
  * warehouse maintains ahead of queries. All helpers are idempotent
  * (content-fingerprinted paths + completion markers), so queries that
  * call them directly stay correct standalone — this just moves the
  * one-time fixture generation out of the first measured run.
  */
object InputPrep {
  /** Each stage is isolated: in round 9 a single failing stage
    * (stageStreams, on the events `ts` schema drift) aborted the whole
    * prep, so every LATER fixture (ANN indexes, bucketed/partitioned
    * layouts) silently fell through to its first timed consumer —
    * x_knn_ivf absorbed a 46 s index build. A stage failure must cost
    * exactly its own fixtures, and must say which stage broke.
    */
  def all(spark: SparkSession, sfDir: String): Unit = {
    val stages: Seq[(String, () => Unit)] = Seq(
      "stageZips" -> (() => CoverageQueries.stageZips(spark, sfDir)),
      "stageMediaZip" -> (() => EngineQueries.stageMediaZip(spark, sfDir)),
      "stageStreams" -> (() => ExtensionQueries.stageStreams(spark, sfDir)),
      "stageAnnIndexes" -> (() => { ExtensionQueries.stageAnnIndexes(spark, sfDir); () }),
      "stageTextIndex" -> (() => { ExtensionQueries.stageTextIndex(spark, sfDir); () }),
      "stageBucketed" -> (() => ScaleQueries.stageBucketed(spark, sfDir)),
      "stagePartitioned" -> (() => ScaleQueries.stagePartitioned(spark, sfDir)),
      "stageJsonl" -> (() => ScaleQueries.stageJsonl(spark, sfDir)),
      "stageOrc" -> (() => ScaleQueries.stageOrc(spark, sfDir)))
    val failed = stages.flatMap { case (name, run) =>
      try { run(); None }
      catch { case e: Throwable =>
        System.err.println(s"[inputprep] $name failed: ${e.getMessage}")
        Some(name)
      }
    }
    if (failed.nonEmpty)
      throw new RuntimeException(s"input prep stages failed: ${failed.mkString(", ")}")
  }
}
