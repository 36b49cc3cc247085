package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation over ranked lists — the harness that
  * turns "the ANN index looks fine" into graded numbers (precision@k,
  * MRR, NDCG@k) against a deterministic qrels set. Built bit-exact:
  *
  *   - per-(query, rank) relevance flags reduce to INTEGERS (hit count,
  *     first-hit rank, one 0/1 flag per rank position), which aggregate
  *     order-independently;
  *   - the NDCG discount table (1/log2(r+1)) and its ideal prefix sums
  *     are computed ONCE on the driver and flow as the SAME double
  *     literals into both the Spark plan and any generated oracle SQL
  *     ([[discounts]]/[[idealPrefix]] + [[literal]]), so no cross-engine
  *     libm call ever happens;
  *   - metrics quantize to fixed point (floor ×1e6) BIGINTs.
  *
  * Scale shape: one join of the ranked lists (queries×k rows) against
  * qrels, one group-by per (system, query) producing k+3 integer
  * aggregates — nothing corpus-sized beyond what produced the rankings.
  */
object Eval {

  /** 1/log2(r+1) for r = 1..k — computed once, driver-side. */
  def discounts(k: Int): Array[Double] =
    (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0))).toArray

  /** Ideal-DCG prefix sums: idealPrefix(k)(j) = Σ_{r≤j} discount(r),
    * j = 0..k (index 0 = 0.0), summed left-to-right — the one summation
    * order both engines share via the literal table.
    */
  def idealPrefix(k: Int): Array[Double] =
    discounts(k).scanLeft(0.0)(_ + _)

  /** Shortest round-trip decimal text of a double — parses back to the
    * identical bits in Java AND in any IEEE-correct SQL engine, so the
    * generated oracle works with the same values the plan does.
    */
  def literal(d: Double): String = java.lang.Double.toString(d)

  /** Grade ranked lists against qrels. `ranked`: (groupCols..., query
    * col `query_id`, `rank` 1-based, `neighbor_id`); `qrels`:
    * (`query_id`, `doc_id`) relevant pairs, both long-keyed. Returns one
    * row per (groupCols, query_id): integer `hits`/`rels`/`first_hit`
    * plus fixed-point `prec_q`/`mrr_q`/`ndcg_q` (floor ×1e6 BIGINTs).
    * Queries with zero relevant docs grade 0 across the board rather
    * than dropping (an eval that silently skips ungradeable queries
    * overstates every mean).
    */
  def rankedEval(ranked: DataFrame, qrels: DataFrame, k: Int,
      groupCols: Seq[String] = Seq("system")): DataFrame = {
    require(k >= 1 && k <= 100, s"k out of range: $k")
    val d = discounts(k)
    val ideal = idealPrefix(k)
    // qrels are a relevance SET — dedup (query_id, doc_id) up front so
    // a doubled qrels row can neither fan out ranked rows through the
    // join (hits > k, prec_q past 1e6) nor double-count rels
    val qrelsD = qrels.select(col("query_id"), col("doc_id")).distinct()
    val rels = qrelsD.groupBy(col("query_id"))
      .agg(count(lit(1)).as("rels"))
    val flags = ranked
      .join(qrelsD.withColumn("__rel", lit(1)),
        ranked("query_id") === qrelsD("query_id") &&
          col("neighbor_id") === col("doc_id"), "left")
      .drop(qrelsD("query_id")).drop("doc_id")
      .withColumn("__rel", coalesce(col("__rel"), lit(0)))
    val keys = groupCols.map(col) :+ col("query_id")
    val perRank = (1 to k).map(r =>
      max(when(col("rank") === r, col("__rel")).otherwise(lit(0))).as(s"__m$r"))
    val aggs = Seq(
      sum(col("__rel")).cast("long").as("hits"),
      min(when(col("__rel") === 1, col("rank"))).as("first_hit")) ++ perRank
    val per = flags.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
      .join(broadcast(rels), Seq("query_id"), "left")
      .withColumn("rels", coalesce(col("rels"), lit(0L)))
    // DCG: Σ m_r · D_r in FIXED rank order (left-assoc literal fold);
    // IDCG from the literal prefix-sum table at min(rels, k)
    val dcg = (1 to k).map(r => col(s"__m$r") * lit(d(r - 1)))
      .reduce(_ + _)
    val idcg = (1 to k).foldLeft(lit(ideal(k)): Column) { (acc, j) =>
      when(col("rels") === (j - 1), lit(ideal(j - 1))).otherwise(acc)
    }
    def fx(c: Column): Column = floor(c * lit(1e6)).cast("long")
    per.select(keys ++ Seq(
      col("hits"), col("rels"),
      // 0 = no hit in the top k; avoids a nullable-int column whose
      // pandas dtype would drift between engines in the hash compare
      coalesce(col("first_hit"), lit(0)).cast("long").as("first_hit"),
      fx(col("hits").cast("double") / lit(k.toDouble)).as("prec_q"),
      fx(when(col("first_hit").isNull, lit(0.0))
        .otherwise(lit(1.0) / col("first_hit"))).as("mrr_q"),
      fx(when(col("rels") === 0, lit(0.0)).otherwise(dcg / idcg)).as("ndcg_q"),
    ): _*)
  }

  /** Exact tie-corrected ROC-AUC per group — the classifier-quality
    * dashboard row a model-based curation stack watches (is the quality
    * scorer still separating the classes it gates on?). AUC is the
    * Mann-Whitney statistic
    *
    *   AUC = [ #(pos > neg) + ½·#(pos = neg) ] / (n_pos·n_neg),
    *
    * computed integer-exact over the per-group SCORE HISTOGRAM: collapse
    * to (group, score, n_pos, n_neg) first, then one window over score
    * levels accumulates the strictly-below negative mass — the doubled
    * numerator 2·#(>) + #(=) stays an int64 and the final value is ONE
    * floor division onto the 10⁶ grid. Never ranks corpus rows: the
    * window runs over distinct score levels (counter-sized), so a 100 TB
    * score column costs one groupBy, and a group with a single giant
    * score domain is a histogram problem, not a sort problem.
    *
    * Input: (groupCol, scoreCol BIGINT-comparable, labelCol boolean).
    * Output per group: (group, n_pos, n_neg, auc_q) — auc_q NULL when
    * the group has no positives or no negatives (AUC undefined; a NULL
    * row beats a silently dropped group on a monitoring dashboard).
    */
  def groupedAuc(scored: DataFrame, groupCol: String, scoreCol: String,
      labelCol: String): DataFrame =
    groupedAucFromHistogram(
      scored.groupBy(col(groupCol), col(scoreCol).as("__s"))
        .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("__np"),
          sum(when(col(labelCol), 0L).otherwise(1L)).as("__nn")),
      groupCol)

  /** [[groupedAuc]] from an already-aggregated score histogram
    * (`groupCol`, __s, __np, __nn) — the entry point the STREAMING
    * monitor uses: histogram cells are associative counters, so a delta
    * store's sum feeds the identical AUC the batch scan would.
    */
  def groupedAucFromHistogram(h: DataFrame, groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val num = h
      .withColumn("__below", coalesce(sum(col("__nn")).over(w), lit(0L)))
      .groupBy(col(groupCol))
      .agg(sum(col("__np")).as("n_pos"), sum(col("__nn")).as("n_neg"),
        sum(col("__np") * (lit(2L) * col("__below") + col("__nn"))).as("__num2"))
    // the ×10⁶ shift runs in decimal(38,0): __num2 can reach n_pos·n_neg
    // (≈ group_rows²/4), so the int64 ceiling would bind at ~4M rows per
    // group — decimal headroom keeps the same arithmetic exact at corpus
    // scale; `div` floors back to a BIGINT on the 10⁶ grid
    num.select(col(groupCol), col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        expr("cast(__num2 as decimal(38,0)) * 1000000 div " +
          "(2 * cast(n_pos as decimal(38,0)) * n_neg)"))
        .cast("long").as("auc_q"))
  }

  /** Deterministic bootstrap confidence interval for the mean of an
    * integer-grid metric — the error bar a data-quality or eval
    * dashboard needs before anyone acts on a moved number. `b`
    * resamples draw n rows WITH REPLACEMENT using engine-portable
    * md5-derived indices (`md5("b:i") mod n` — [[PortableHash]]'s
    * family, so a second engine replays the exact draw, noise
    * included); each resample's mean floors onto the metric's own grid,
    * and the interval is the [2nd, b−1th] order statistic of the b
    * means (≈90% for b = 32).
    *
    * Scale shape: rows get a global index through the two-phase
    * [[graft.operators.Ids.globalRowNumber]] (never a single-partition
    * window over the corpus), the draw table is b·n rows joined back by
    * one equi-join, and everything after the per-resample groupBy is
    * b-row arithmetic. The b means are exact long sums — metric grid
    * 10⁶ bounds n at ~9·10¹² rows before the sum would wrap.
    *
    * Output, one row: (n_rows, n_resamples, point_q, lo_q, hi_q).
    */
  def bootstrapMeanQ(df: DataFrame, orderCol: String, metricCol: String,
      b: Int = 32): DataFrame = {
    require(b >= 4, s"need at least 4 resamples for an interval: $b")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val indexed = graft.operators.Ids.globalRowNumber(
      df.select(col(orderCol), col(metricCol).cast("long").as("__m")),
      Seq(col(orderCol)), "__rn")
      .select(col("__rn"), col("__m"))
      .localCheckpoint(eager = true) // the draw join + the point estimate
    val n = indexed.count() // counter-sized driver value (row count)
    require(n > 0, "bootstrapMeanQ over an empty frame")
    val draws = spark.range(b.toLong * n)
      .select(expr(s"id div ${n}L").as("__b"), expr(s"id % ${n}L").as("__i"))
      .select(col("__b"),
        pmod(PortableHash.md5Prefix15(
          concat(col("__b").cast("string"), lit(":"),
            col("__i").cast("string"))), lit(n)).as("__idx"))
    val means = draws.join(indexed, col("__idx") + 1 === col("__rn"))
      .groupBy(col("__b")).agg(sum(col("__m")).as("__s"))
      .select(expr(s"__s div ${n}L").as("__mean"))
    // both bounds in ONE pass over the b-row ranked frame (two filtered
    // branches would re-run the draw join once per bound)
    val bounds = means
      .withColumn("__rk", row_number().over(Window.orderBy(col("__mean"))))
      .agg(max(when(col("__rk") === 2, col("__mean"))).as("lo_q"),
        max(when(col("__rk") === b - 1, col("__mean"))).as("hi_q"))
    val point = indexed.agg(expr(s"sum(__m) div ${n}L").as("point_q"),
      count(lit(1)).as("n_rows"))
    point.crossJoin(broadcast(bounds))
      .select(col("n_rows"), lit(b).as("n_resamples"), col("point_q"),
        col("lo_q"), col("hi_q"))
  }

  /** The CASE/arithmetic SQL fragments a generated oracle needs to
    * replay [[rankedEval]]'s metric epilogue bit-for-bit: (dcgExpr over
    * m1..mk columns, idcgExpr over a `rels` column) — the same literal
    * doubles the plan uses, textualized via [[literal]].
    */
  def metricSqlFragments(k: Int): (String, String) = {
    val d = discounts(k)
    val ideal = idealPrefix(k)
    val dcg = (1 to k).map(r => s"m$r*${literal(d(r - 1))}").mkString(" + ")
    val idcg = (1 until k)
      .map(j => s"WHEN rels = $j THEN ${literal(ideal(j))}")
      .mkString(s"CASE WHEN rels = 0 THEN 0.0 ", " ",
        s" ELSE ${literal(ideal(k))} END")
    (dcg, idcg)
  }
}
