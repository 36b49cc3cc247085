package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols.qcol

/** Ordered-funnel analysis — the product-analytics staple: how many
  * users reached stage 1, then stage 2 strictly AFTER their stage-1
  * moment, then stage 3 after that, and so on. "After" is strict in
  * the (ts, tie) lexicographic order, so two events sharing a
  * timestamp resolve deterministically and an event can never witness
  * two stages at once.
  *
  * Shape: stage k's reach frame is `min (ts, tie)` of the qualifying
  * events later than the user's stage-(k−1) reach — one equi-join on
  * the user key plus one min-aggregate per stage, each frame no larger
  * than the previous (funnels only narrow). All joins are on the user
  * key; with per-user event counts bounded this is |stages| narrow
  * shuffles, no windows, no cross products.
  */
object Funnel {

  /** Per-stage reach counts. `stages` are (name, row predicate) in
    * funnel order. Output: (`stage_index`, `stage`, `n_users`),
    * monotonically non-increasing in `stage_index`.
    */
  def funnelCounts(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "no funnel stages given")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(Seq(qcol(userCol).as("__user"),
        struct(qcol(tsCol), qcol(tieCol)).as("__k")) ++
        stages.map(_._2).zipWithIndex
          .map { case (p, i) => p.as(s"__p$i") }: _*)
      .localCheckpoint(eager = true) // every stage scans it
    var reach = base.filter(col("__p0"))
      .groupBy(col("__user")).agg(min(col("__k")).as("__r"))
    val counts = Array.newBuilder[(Int, String, Long)]
    counts += ((0, stages.head._1, reach.count()))
    stages.zipWithIndex.drop(1).foreach { case ((name, _), i) =>
      reach = base.filter(col(s"__p$i"))
        .join(reach, Seq("__user"))
        .filter(col("__k") > col("__r"))
        .groupBy(col("__user")).agg(min(col("__k")).as("__r"))
        .localCheckpoint(eager = true) // counted AND joined by stage i+1
      counts += ((i, name, reach.count()))
    }
    counts.result().toSeq.toDF("stage_index", "stage", "n_users")
  }
}
