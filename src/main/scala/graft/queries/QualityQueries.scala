package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{AnnIndex, Quality, Similarity, Sketch, Stats}

/** Round-12 curation/monitoring wave: portable distinct sketches, drift
  * monitoring, declarative data-quality gates, filtered + truncated-dim
  * vector search. Every query hash-matches a DuckDB replay.
  */
object QualityQueries {
  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  /** KMV distinct-count sketch per event_type over user_id — the
    * engine-portable companion of the CMS: k smallest md5-prefix hashes,
    * (k-1)·2^60/h_(k) estimator, small groups degenerate to exact
    * counts. The ESTIMATES hash-match (the sketch replays bit-for-bit),
    * not just an error band; `x_approx_distinct_gate` keeps pinning the
    * built-in HLL's band separately.
    */
  val distinctKmv = q("x_distinct_kmv",
    """WITH h AS (
      |  SELECT DISTINCT event_type,
      |         CAST(CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15) AS UBIGINT) AS BIGINT) AS h
      |  FROM events WHERE user_id IS NOT NULL),
      |r AS (SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h),
      |kept AS (SELECT event_type, max(h) AS hk, max(rn) AS n
      |         FROM r WHERE rn <= 64 GROUP BY event_type)
      |SELECT event_type,
      |       round(CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
      |             ELSE 63.0 * 1152921504606846976 / hk END, 4) AS est_distinct
      |FROM kept""".stripMargin) { (s, dir) =>
    Sketch.kmvDistinct(Tables.events(s, dir), "event_type", col("user_id"), 64)
  }

  /** PSI drift between the even/odd event_id halves of the event stream,
    * per event_type, over 20 unit-width value bins on [0, 20) (values
    * past the domain clamp into the edge bin) — the scheduled
    * feature-drift monitor. The halves are statistically identical, so
    * healthy PSI ≈ 0 — and the oracle replays the exact smoothed
    * arithmetic, not the "close to zero" judgment.
    */
  val driftPsi = q("x_drift_psi",
    """WITH e AS (
      |  SELECT event_type, value, event_id % 2 AS side FROM events
      |  WHERE value IS NOT NULL),
      |b AS (
      |  SELECT event_type,
      |         CAST(least(greatest(floor((value - 0.0) / 1.0), 0), 19) AS INT) AS bin,
      |         CASE WHEN side = 0 THEN 1 ELSE 0 END AS r,
      |         CASE WHEN side = 1 THEN 1 ELSE 0 END AS c
      |  FROM e),
      |counts AS (SELECT event_type, bin, sum(r) AS nr, sum(c) AS nc FROM b GROUP BY 1, 2),
      |tot AS (SELECT event_type, sum(nr) AS tr, sum(nc) AS tc FROM counts GROUP BY 1)
      |SELECT t.event_type, CAST(t.tr AS BIGINT) AS n_ref, CAST(t.tc AS BIGINT) AS n_cur,
      |       round(sum(((nr + 0.5) / (tr + 10.0) - (nc + 0.5) / (tc + 10.0))
      |             * ln(((nr + 0.5) / (tr + 10.0)) / ((nc + 0.5) / (tc + 10.0)))), 6) AS psi
      |FROM counts JOIN tot t USING (event_type)
      |GROUP BY 1, 2, 3""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
    Stats.psi(e.filter(col("event_id") % 2 === 0),
      e.filter(col("event_id") % 2 === 1),
      "event_type", col("value"), bins = 20, lo = 0.0, hi = 20.0)
  }

  /** Declarative data-quality gate over orders: four row expectations in
    * ONE counter-aggregate scan plus referential integrity to customer
    * as a broadcast anti-join — the publish-time contract report. The
    * price-cap rule is deliberately tight enough to FIRE on real rows,
    * so the report's violation arithmetic (not just all-zero passes) is
    * what hash-matches.
    */
  val dqExpectations = q("x_dq_expectations",
    """SELECT 'o_orderkey_not_null' AS rule,
      |       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) = 0 AS pass
      |FROM orders
      |UNION ALL
      |SELECT 'o_totalprice_under_400k',
      |       CAST(sum(CASE WHEN o_totalprice IS NULL OR NOT (o_totalprice >= 0 AND o_totalprice < 400000) THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(count(*) AS BIGINT),
      |       CAST(sum(CASE WHEN o_totalprice IS NULL OR NOT (o_totalprice >= 0 AND o_totalprice < 400000) THEN 1 ELSE 0 END) AS BIGINT) = 0
      |FROM orders
      |UNION ALL
      |SELECT 'o_orderstatus_in_domain',
      |       CAST(sum(CASE WHEN o_orderstatus IS NULL OR o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(count(*) AS BIGINT),
      |       CAST(sum(CASE WHEN o_orderstatus IS NULL OR o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT) = 0
      |FROM orders
      |UNION ALL
      |SELECT 'o_orderdate_after_1994',
      |       CAST(sum(CASE WHEN o_orderdate IS NULL OR NOT (o_orderdate >= DATE '1995-01-01') THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(count(*) AS BIGINT),
      |       CAST(sum(CASE WHEN o_orderdate IS NULL OR NOT (o_orderdate >= DATE '1995-01-01') THEN 1 ELSE 0 END) AS BIGINT) = 0
      |FROM orders
      |UNION ALL
      |SELECT 'o_custkey_in_customer',
      |       CAST((SELECT count(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |             WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL) AS BIGINT),
      |       CAST((SELECT count(*) FROM orders) AS BIGINT),
      |       CAST((SELECT count(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |             WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL) AS BIGINT) = 0""".stripMargin) {
    (s, dir) =>
      val orders = Tables.orders(s, dir)
      Quality.expectations(orders, Seq(
        "o_orderkey_not_null" -> col("o_orderkey").isNotNull,
        "o_totalprice_under_400k" ->
          (col("o_totalprice") >= 0 && col("o_totalprice") < 400000),
        "o_orderstatus_in_domain" ->
          col("o_orderstatus").isin("O", "F", "P"),
        "o_orderdate_after_1994" ->
          (col("o_orderdate") >= lit(java.sql.Date.valueOf("1995-01-01"))),
      )).unionByName(Quality.referentialViolations(orders, "o_custkey",
        Tables.customer(s, dir), "c_custkey", "o_custkey_in_customer"))
  }

  /** FILTERED vector search against the persisted IVF index: the
    * metadata predicate (even neighbor ids here) composes with nprobe
    * partition pruning INSIDE the pruned codes scan, and the result is
    * the exact top-k of the probed ∩ predicate corpus — never the
    * under-filled k of post-filtering a top-k list. Oracle = the
    * x_knn_ivf replay with the same predicate on the stored rows.
    */
  val knnFiltered = q("x_knn_filtered",
    """WITH qv AS (
      |  SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings WHERE vec_id < 5),
      |cent AS (
      |  SELECT __cid, centroid FROM read_parquet('__GRAFT_ANNIDX__/ivf/coarse/*.parquet')),
      |probe AS (
      |  SELECT qid, __cid,
      |         row_number() OVER (PARTITION BY qid ORDER BY
      |           list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * centroid[i]))
      |             / (sqrt(list_sum(list_transform(v, x -> x*x)))
      |                * sqrt(list_sum(list_transform(centroid, x -> x*x)))) DESC,
      |           __cid) AS pr
      |  FROM qv, cent),
      |probed AS (SELECT qid, __cid FROM probe WHERE pr <= 4),
      |vecs AS (
      |  SELECT __id AS nid, CAST(__cluster AS INTEGER) AS cl,
      |         list_transform(__vec, x -> CAST(x AS DOUBLE)) AS w
      |  FROM read_parquet('__GRAFT_ANNIDX__/ivf/vectors/*/*.parquet', hive_partitioning=1)
      |  WHERE __id % 2 = 0),
      |scored AS (
      |  SELECT p.qid, vecs.nid,
      |         round(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * vecs.w[i]))
      |           / (sqrt(list_sum(list_transform(q.v, x -> x*x)))
      |              * sqrt(list_sum(list_transform(vecs.w, x -> x*x)))), 4) AS s
      |  FROM probed p JOIN vecs ON vecs.cl = p.__cid
      |  JOIN qv q ON q.qid = p.qid
      |  WHERE p.qid <> vecs.nid),
      |ranked AS (
      |  SELECT qid AS query_id, nid AS neighbor_id, s AS cosine,
      |         row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid) AS rank
      |  FROM scored)
      |SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= 5""".stripMargin) {
    (s, dir) =>
      val idx = ExtensionQueries.stageAnnIndexes(s, dir)
      AnnIndex.ivfTopK(s, AnnIndex.readIvf(s, s"$idx/ivf"),
        Tables.embeddings(s, dir).filter(col("vec_id") < 5),
        "vec_id", "embedding", 5, nprobe = 4,
        where = pmod(col("__id"), lit(2)) === 0)
  }

  /** Matryoshka-style truncated-dimension search: score on the LEADING
    * 16 of 64 dimensions (the MRL deployment trick — a prefix of an
    * embedding trained for it is itself an embedding; cosine needs no
    * re-normalization since it normalizes per pair). The cheap first
    * pass of a truncate-then-rerank cascade, exact over its truncated
    * geometry — so it hash-matches, unlike a recall-banded approximation.
    */
  val knnMrl = q("x_knn_mrl",
    """WITH q AS (
      |  SELECT vec_id AS qid, embedding[1:16] AS qv FROM embeddings WHERE vec_id < 5),
      |c AS (SELECT vec_id, embedding[1:16] AS cv FROM embeddings),
      |scored AS (
      |  SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
      |         list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.cv AS DOUBLE[])) AS s
      |  FROM q, c WHERE c.vec_id <> q.qid),
      |r AS (SELECT query_id, neighbor_id, s,
      |             row_number() OVER (PARTITION BY query_id ORDER BY round(s, 4) DESC, neighbor_id) AS rank
      |      FROM scored)
      |SELECT query_id, rank, neighbor_id, round(s, 4) AS cosine FROM r WHERE rank <= 5""".stripMargin) {
    (s, dir) =>
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding"))
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", 5)
  }

  val all: Seq[QueryDef] = Seq(distinctKmv, driftPsi, dqExpectations,
    knnFiltered, knnMrl)
}
