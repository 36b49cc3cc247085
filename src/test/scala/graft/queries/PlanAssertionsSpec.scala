package graft.queries

import graft.SparkSpec
import graft.operators.{Ids, RelationResolver}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** The scale claims, encoded as plan assertions: broadcast-only relation
  * lookups and key-partitioned windows are architecture invariants, not
  * happy accidents of one Spark version's planner.
  */
class PlanAssertionsSpec extends SparkSpec {
  import spark.implicits._

  private def finalPlan(df: DataFrame): SparkPlan = df.queryExecution.executedPlan match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case p => p
  }

  /** Flatten across AQE stage boundaries (QueryStageExec children live in
    * `plan`, not `children`).
    */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case _ => p +: p.children.flatMap(allNodes)
  }

  test("relation lookup joins broadcast the dimension — the fact side never sort-merges") {
    val incoming = (1 to 500).map(i => (i.toLong, s"n${i % 25}")).toDF("id", "nation")
    val target = (0 until 25).map(i => (i.toLong, s"n$i")).toDF("tid", "name")
    val out = RelationResolver.resolveByField(incoming, "nation", target, "tid", "name", "rid")
    out.collect()
    val plan = finalPlan(out).toString
    plan should include("BroadcastHashJoin")
    (plan should not).include("SortMergeJoin")
  }

  test("every window in the distributed id assignment is key-partitioned") {
    val df = (1 to 100).map(i => (s"f$i", i.toLong)).toDF("name", "size")
    val ids = Ids.globalRowNumber(df, Seq(col("name")), "id")
    ids.collect()
    val windows = allNodes(finalPlan(ids)).collect { case w: WindowExec => w }
    windows should not be empty
    windows.foreach(w => w.partitionSpec should not be empty)
  }
}
