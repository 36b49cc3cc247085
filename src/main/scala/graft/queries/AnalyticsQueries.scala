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
  /** The oracle replays the INTERPOLATION FORMULA from first principles
    * (rank h = (n−1)·p in DOUBLE — the explicit casts matter: a DECIMAL
    * probability literal would make h exact where Spark's double h is
    * not — value = x_lo + frac·(x_hi − x_lo)): both engines then run
    * the identical IEEE expression and the quantiles are BIT-identical,
    * so no output rounding is needed — or wanted: decimal rounding was
    * the one non-portable step (DuckDB rounds doubles by scaled
    * multiply, Spark by true decimal expansion; at sf0.001 a p50 landed
    * where the two disagree, caught by the driver-faithful harness).
    */
  val percentiles = q("x_stats_percentiles",
    """WITH v AS (
      |  SELECT l_returnflag AS g, CAST(l_extendedprice AS DOUBLE) AS x
      |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
      |r AS (
      |  SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x) - 1 AS rk,
      |         count(*) OVER (PARTITION BY g) AS n
      |  FROM v),
      |p AS (SELECT unnest(['p50', 'p95']) AS nm,
      |             unnest([CAST(0.5 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS pr),
      |t AS (
      |  SELECT gn.g, gn.n, p.nm, (gn.n - 1) * p.pr AS h
      |  FROM (SELECT DISTINCT g, n FROM r) gn CROSS JOIN p),
      |pick AS (
      |  SELECT t.g, t.n, t.nm, t.h - floor(t.h) AS frac, lo.x AS xlo, hi.x AS xhi
      |  FROM t
      |  JOIN r lo ON lo.g = t.g AND lo.rk = CAST(floor(t.h) AS BIGINT)
      |  JOIN r hi ON hi.g = t.g
      |    AND hi.rk = least(CAST(floor(t.h) AS BIGINT) + 1, t.n - 1))
      |SELECT g AS l_returnflag,
      |       max(CASE WHEN nm = 'p50' THEN xlo + frac * (xhi - xlo) END) AS p50,
      |       max(CASE WHEN nm = 'p95' THEN xlo + frac * (xhi - xlo) END) AS p95,
      |       CAST(max(n) AS BIGINT) AS n
      |FROM pick GROUP BY g""".stripMargin) { (s, dir) =>
    graft.ext.Stats.quantileCont(Tables.lineitem(s, dir),
        "l_returnflag", "l_extendedprice", Seq("p50" -> 0.5, "p95" -> 0.95))
      .select(col("l_returnflag"), col("p50"), col("p95"), col("n"))
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

  /** percentile_approx rank-error gate (the quantile analog of the HLL
    * gate above): the sketch's answer must sit within 2/accuracy of the
    * target RANK — the guarantee Spark's QuantileSummaries documents.
    * The approximate VALUE can't be oracle-matched (DuckDB's sketch
    * differs), but the rank bound is engine-independent: rank(v) is
    * counted exactly, two-sided (count< and count≤ bracket the target,
    * so duplicates can't fake a failure). At 100 TB the sketch is the
    * affordable quantile; this keeps its error visible to CORRECTNESS.
    */
  val approxQuantileGate = q("x_approx_quantile_gate", "SELECT true AS rank_ok") {
    (s, dir) =>
      val v = Tables.lineitem(s, dir).select(col("l_extendedprice").cast("double").as("v"))
      val qs = Seq(0.5, 0.9, 0.99)
      val acc = 1000
      val eps = 2.0 / acc // documented bound is 1/acc; 2× headroom
      // 3 approximate values — a bounded driver read, like a dim probe
      val a = v.agg(percentile_approx(col("v"), typedLit(qs), lit(acc)).as("a"))
        .head().getSeq[Double](0)
      val checks = qs.zipWithIndex.flatMap { case (_, i) =>
        Seq(sum(when(col("v") < a(i), 1L).otherwise(0L)).as(s"lo$i"),
          sum(when(col("v") <= a(i), 1L).otherwise(0L)).as(s"hi$i"))
      }
      val r = v.agg(count(lit(1)).as("n"), checks: _*)
      val n = col("n").cast("double")
      val ok = qs.zipWithIndex.map { case (q, i) =>
        (col(s"hi$i") >= (lit(q) - eps) * n) && (col(s"lo$i") <= (lit(q) + eps) * n)
      }.reduce(_ && _)
      r.select(ok.as("rank_ok"))
  }

  /** One-pass ANALYZE-style table profile over four lineitem measures:
    * row/null/exact-distinct counts and 4dp value ranges per column —
    * Spark plans the multi-column countDistinct through a single
    * expand+partial-aggregate job (no per-column rescans).
    */
  val profileTable = q("x_profile_table",
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").map(c =>
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |       count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct,
         |       CAST(round(min($c), 4) AS DOUBLE) AS min_v,
         |       CAST(round(max($c), 4) AS DOUBLE) AS max_v,
         |       CAST(round(avg($c), 4) AS DOUBLE) AS avg_v
         |FROM lineitem""".stripMargin).mkString("\nUNION ALL\n")) { (s, dir) =>
    graft.ext.Profile.numericProfile(Tables.lineitem(s, dir),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
  }

  /** Exact per-group heavy hitters: top-3 event types per user by
    * (count desc, type asc) — map-side-combined counts, window over the
    * group×distinct-value frame only.
    */
  val topkPerGroup = q("x_topk_per_group",
    """WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
      |                                   ORDER BY n DESC, event_type) AS rank
      |      FROM c)
      |SELECT user_id, rank, event_type, n FROM r WHERE rank <= 3""".stripMargin) {
    (s, dir) =>
      graft.ext.Stats.topKPerGroup(Tables.events(s, dir), "user_id", "event_type", 3)
  }

  /** Sliding-window aggregation (2-hour windows hopping hourly): each
    * event lands in length/slide overlapping windows — the oracle
    * replays the expansion with an explicit hop unnest.
    */
  val slidingWindow = q("x_sliding_window",
    """WITH w AS (SELECT time_bucket(INTERVAL '1 hour', ts) - k * INTERVAL 1 HOUR AS window_start,
      |                  event_type, value
      |           FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k))
      |SELECT window_start, event_type, count(*) AS n_events,
      |       round(sum(value), 2) AS sum_value
      |FROM w GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    graft.streaming.EventStreams.slidingWindowAgg(Tables.events(s, dir),
      "2 hours", "1 hour")
  }

  /** Equi-depth quartile binning of order totals WITHOUT a
    * single-partition ntile window: distributed range-partitioned rank
    * + closed-form SQL-standard ntile arithmetic (integer math, so the
    * oracle's native ntile agrees row for row).
    */
  val ntileBinning = q("x_ntile_binning",
    """WITH r AS (SELECT o_totalprice AS v,
      |                  ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      |           FROM orders WHERE o_totalprice IS NOT NULL)
      |SELECT bin, count(*) AS n, round(min(v), 4) AS min_v, round(max(v), 4) AS max_v
      |FROM r GROUP BY 1""".stripMargin) { (s, dir) =>
    graft.ext.Stats.equiDepthBins(Tables.orders(s, dir), "o_totalprice",
      "o_orderkey", bins = 4)
  }

  /** Point-in-time rolling features (feature-store shape): per event,
    * the same user's activity over the trailing 24 hours — a RANGE
    * window frame on event time (micros), key-partitioned so the sort
    * is per-user and spilling, never global. The as-of/sessionize cost
    * class: one key shuffle + per-partition sort.
    */
  val rollingFeatures = q("x_rolling_features",
    """SELECT event_id, user_id, ts,
      |       count(*) OVER w AS n_24h,
      |       round(sum(value) OVER w, 2) AS sum_24h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |             RANGE BETWEEN INTERVAL 24 HOURS PRECEDING AND CURRENT ROW)""".stripMargin) {
    (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val dayUs = 24L * 3600 * 1000000L
      val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
        .rangeBetween(-dayUs, 0)
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          count(lit(1)).over(w).as("n_24h"),
          round(sum(col("value")).over(w), 2).as("sum_24h"))
  }

  /** Fixed-iteration PageRank over the supplier→customer fulfillment
    * graph (suppliers offset to disambiguate the id spaces) — the
    * iterative-joins computation class (Pregel-lite driver loop of
    * distributed steps); the oracle unrolls the three iterations as SQL
    * and must agree to 8dp on every node.
    */
  val pagerank = q("x_pagerank",
    """WITH e AS (SELECT DISTINCT l_suppkey + 1000000 AS src, o_custkey AS dst
      |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
      |deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY 1),
      |r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),
      |c1 AS (SELECT e.dst AS node, sum(r0.r / deg.deg) AS i
      |       FROM e JOIN r0 ON r0.node = e.src JOIN deg USING (src) GROUP BY 1),
      |r1 AS (SELECT nodes.node, (1.0 - 0.85) / nn.n + 0.85 * coalesce(c1.i, 0) AS r
      |       FROM nodes CROSS JOIN nn LEFT JOIN c1 USING (node)),
      |c2 AS (SELECT e.dst AS node, sum(r1.r / deg.deg) AS i
      |       FROM e JOIN r1 ON r1.node = e.src JOIN deg USING (src) GROUP BY 1),
      |r2 AS (SELECT nodes.node, (1.0 - 0.85) / nn.n + 0.85 * coalesce(c2.i, 0) AS r
      |       FROM nodes CROSS JOIN nn LEFT JOIN c2 USING (node)),
      |c3 AS (SELECT e.dst AS node, sum(r2.r / deg.deg) AS i
      |       FROM e JOIN r2 ON r2.node = e.src JOIN deg USING (src) GROUP BY 1),
      |r3 AS (SELECT nodes.node, (1.0 - 0.85) / nn.n + 0.85 * coalesce(c3.i, 0) AS r
      |       FROM nodes CROSS JOIN nn LEFT JOIN c3 USING (node))
      |SELECT node, round(r, 8) AS rank FROM r3""".stripMargin) { (s, dir) =>
    val e = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") + 1000000L).as("src"), col("o_custkey").as("dst"))
    graft.ext.Graph.pageRank(e, "src", "dst", iters = 3)
      .select(col("node"), round(col("rank"), 8).as("rank"))
  }

  /** Deterministic label-propagation communities over a slice of the
    * supplier↔customer graph (undirected; suppliers offset): three
    * synchronous mode-adoption rounds, ties to the smallest label —
    * the near-linear community detector beside PageRank's ranking and
    * the components family's exact closure. The oracle unrolls every
    * round; a wrong mode or tie anywhere relabels downstream nodes and
    * breaks the hash.
    */
  val communitiesLp = q("x_communities_lp",
    """WITH e0 AS (SELECT DISTINCT l_suppkey + 1000000 AS a, o_custkey AS b
      |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |            WHERE o_orderkey % 4 = 0),
      |e AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
      |l0 AS (SELECT DISTINCT a AS node, a AS community FROM e),
      |c1 AS (SELECT e.a AS node, l.community, count(*) AS c
      |       FROM e JOIN l0 l ON l.node = e.b GROUP BY 1, 2),
      |l1 AS (SELECT node, community FROM (
      |         SELECT *, row_number() OVER (PARTITION BY node ORDER BY c DESC, community) AS r
      |         FROM c1) WHERE r = 1),
      |c2 AS (SELECT e.a AS node, l.community, count(*) AS c
      |       FROM e JOIN l1 l ON l.node = e.b GROUP BY 1, 2),
      |l2 AS (SELECT node, community FROM (
      |         SELECT *, row_number() OVER (PARTITION BY node ORDER BY c DESC, community) AS r
      |         FROM c2) WHERE r = 1),
      |c3 AS (SELECT e.a AS node, l.community, count(*) AS c
      |       FROM e JOIN l2 l ON l.node = e.b GROUP BY 1, 2),
      |l3 AS (SELECT node, community FROM (
      |         SELECT *, row_number() OVER (PARTITION BY node ORDER BY c DESC, community) AS r
      |         FROM c3) WHERE r = 1)
      |SELECT node, community FROM l3""".stripMargin) { (s, dir) =>
    val e = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderkey") % 4 === 0),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("l_suppkey") + 1000000L).as("src"), col("o_custkey").as("dst"))
    graft.ext.Graph.labelPropagation(e, "src", "dst", iters = 3)
  }

  val all: Seq[QueryDef] = Seq(percentiles, rollup, pivot, approxDistinctGate,
    approxQuantileGate, profileTable, topkPerGroup, slidingWindow, ntileBinning,
    rollingFeatures, pagerank, communitiesLp)
}
