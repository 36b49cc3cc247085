package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Aggregation-surface depth beyond the reference's count/groupBy usage
  * (SURVEY §2.6): exact interpolated percentiles, rollup lattices, pivot —
  * each replayed exactly by DuckDB.
  */
object AnalyticsQueries {

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  /** Exact linear-interpolation percentiles per group (≡ DuckDB
    * `quantile_cont`), via the distributed rank formulation in `ext.Stats` —
    * Spark's `percentile` aggregate would buffer every group value in one
    * task's memory (OOM at 100 TB); percentile_approx would NOT
    * oracle-match. Exactness AND distribution are the point of the gate.
    */
  val percentiles = q("x_stats_percentiles",
    """SELECT l_returnflag,
      |       round(quantile_cont(l_extendedprice, 0.5), 2) AS p50,
      |       round(quantile_cont(l_extendedprice, 0.95), 2) AS p95,
      |       count(*) AS n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
    graft.ext.Stats.quantileCont(Tables.lineitem(s, dir),
        "l_returnflag", "l_extendedprice", Seq("p50" -> 0.5, "p95" -> 0.95))
      .select(col("l_returnflag"), round(col("p50"), 2).as("p50"),
        round(col("p95"), 2).as("p95"), col("n"))
  }

  /** Rollup lattice over region → nation with the partial-aggregation
    * benefit of a single pass (NULL marks the aggregated levels, exactly
    * as DuckDB's ROLLUP emits them).
    */
  val rollup = q("x_rollup_customers",
    """SELECT r_name, n_name, count(*) AS n_cust
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"))
  }

  /** Pivot order statuses into columns (plan-time column set — the pivot
    * values are declared, so no extra distinct-scan job).
    */
  val pivot = q("x_pivot_status",
    """SELECT o_orderpriority,
      |       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
      |       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled,
      |       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending
      |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("O"), lit(0)).as("n_open"),
        coalesce(col("F"), lit(0)).as("n_filled"),
        coalesce(col("P"), lit(0)).as("n_pending"))
  }

  /** HyperLogLog++ distinct-count sketch gated like the recall queries:
    * the approximate per-type user counts must land within 5% of exact
    * for every type (boolean row the oracle asserts). At 100 TB the
    * sketch is the only affordable distinct count; the gate keeps its
    * error visible to CORRECTNESS instead of unchecked.
    */
  val approxDistinctGate = q("x_approx_distinct_gate", "SELECT true AS within_5pct") {
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          approx_count_distinct(col("user_id"), rsd = 0.02).as("approx"),
          countDistinct(col("user_id")).as("exact"))
        .agg(max(abs(col("approx") - col("exact")).cast("double") / col("exact"))
          .as("max_err"))
        .select((col("max_err") <= 0.05).as("within_5pct"))
  }

  val all: Seq[QueryDef] = Seq(percentiles, rollup, pivot, approxDistinctGate)
}
