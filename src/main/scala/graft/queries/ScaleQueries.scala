package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Skew

/** Scale-pattern demonstrations under the oracle gate: the techniques the
  * 100 TB brief calls for (skew salting, bucketed co-located joins) run as
  * first-class CORRECTNESS queries, not just utility code — the salted /
  * bucketed plans must produce byte-identical results to the plain
  * formulations DuckDB replays.
  */
object ScaleQueries {

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  /** Skewed fact→dim join via deterministic salting: customer's 25 nation
    * keys are exactly the hot-key shape where one key pins one task; the
    * salted join spreads each key over 8 partitions and must equal the
    * plain join (oracle).
    */
  val saltedJoin = q("x_salted_join",
    """SELECT n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name""".stripMargin) { (s, dir) =>
    val small = Tables.nation(s, dir)
      .select(col("n_nationkey").as("c_nationkey"), col("n_name"))
    Skew.saltedJoin(Tables.customer(s, dir), small, "c_nationkey", salt = 8)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("total_bal"))
  }

  /** Two-phase salted aggregation on the same hot keys: per-(key, salt)
    * partials combine to the exact plain groupBy result.
    */
  val saltedAgg = q("x_salted_agg",
    "SELECT c_nationkey, count(*) AS n_cust FROM customer GROUP BY c_nationkey") {
    (s, dir) =>
      Skew.saltedAgg(
        Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
        "c_nationkey", salt = 8,
        partial = Seq(count(lit(1)).as("__pc")),
        combine = Seq(sum(col("__pc")).as("n_cust")))
  }

  /** Co-located join via bucketed tables: orders and lineitem are written
    * bucketed+sorted on the order key (input prep), then joined WITHOUT a
    * shuffle on the join key — the layout prepays the exchange, the pattern
    * that turns a repeated 100 TB fact-fact join from per-query shuffles
    * into a merge of pre-sorted buckets. `BucketedJoinSpec` asserts the
    * exchange-free plan; this query asserts result parity with the plain
    * join the oracle replays.
    */
  /** Input prep (idempotent): write the bucketed layouts once per
    * (sf dir, content fingerprint) and register the external tables —
    * the curated layout a warehouse would maintain AHEAD of queries.
    */
  def stageBucketed(s: SparkSession, dir: String): Unit = {
    val tag = Staging.tag(dir)
    def prep(table: String, path: String, keyCol: String, write: => Unit,
        ddlCols: String): Unit = {
      s.sql(s"DROP TABLE IF EXISTS $table")
      if (new java.io.File(s"$path/_SUCCESS").exists())
        s.sql(s"""CREATE TABLE $table ($ddlCols) USING parquet
                 |CLUSTERED BY ($keyCol) SORTED BY ($keyCol) INTO 16 BUCKETS
                 |LOCATION '$path'""".stripMargin)
      else write
    }
    prep("graft_orders_b", s"/tmp/graft_bucketed/$tag/orders", "o_orderkey",
      Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(16, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"/tmp/graft_bucketed/$tag/orders")
        .saveAsTable("graft_orders_b"),
      "o_orderkey BIGINT, o_orderpriority STRING")
    prep("graft_lineitem_b", s"/tmp/graft_bucketed/$tag/lineitem", "l_orderkey",
      Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_extendedprice"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(16, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"/tmp/graft_bucketed/$tag/lineitem")
        .saveAsTable("graft_lineitem_b"),
      "l_orderkey BIGINT, l_extendedprice DOUBLE")
  }

  val bucketedJoin = q("x_bucketed_join",
    """SELECT o_orderpriority, count(*) AS n_items, round(sum(l_extendedprice), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
    stageBucketed(s, dir)
    s.table("graft_lineitem_b")
      .join(s.table("graft_orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))
  }

  /** Partitioned-layout round trip: events written `partitionBy(event_type)`
    * (input prep), read back with a partition filter + aggregate. The
    * filter prunes at the directory level (`PartitionPruningSpec` asserts
    * the plan); this query asserts the layout round-trips values exactly —
    * partition columns come back from directory names, not file data.
    */
  /** Input prep (idempotent): the partitioned events layout. _SUCCESS (not
    * bare directory existence): a crash mid-write must not leave a partial
    * dataset that later runs silently reuse.
    */
  def stagePartitioned(s: SparkSession, dir: String): String = {
    val tmp = s"/tmp/graft_part/${Staging.tag(dir)}"
    if (!new java.io.File(s"$tmp/_SUCCESS").exists())
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        .write.partitionBy("event_type").mode("overwrite").parquet(tmp)
    tmp
  }

  /** Input prep (idempotent): documents as JSON lines. */
  def stageJsonl(s: SparkSession, dir: String): String = {
    val tmp = s"/tmp/graft_jsonl/${Staging.tag(dir)}"
    if (!new java.io.File(s"$tmp/_SUCCESS").exists())
      Tables.documents(s, dir).select(col("doc_id"), col("text"), col("source"))
        .write.mode("overwrite").json(tmp)
    tmp
  }

  val partitionedScan = q("x_partitioned_scan",
    """SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
      |FROM events WHERE event_type = 'click'
      |GROUP BY user_id""".stripMargin) { (s, dir) =>
    val tmp = stagePartitioned(s, dir)
    s.read.parquet(tmp)
      .filter(col("event_type") === "click")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
  }

  /** JSONL round trip — the training-data interchange format: documents
    * written as JSON lines (input prep) and read back with an EXPLICIT
    * schema (no inference pre-scan — at 100 TB schema inference is a full
    * extra pass). Values, including JSON string escaping of quotes/
    * newlines/unicode, must survive the trip exactly; the oracle reads the
    * original parquet.
    */
  val jsonlRoundtrip = q("x_jsonl_roundtrip",
    "SELECT doc_id, text, source FROM documents") { (s, dir) =>
    s.read.schema("doc_id long, text string, source string").json(stageJsonl(s, dir))
  }

  /** Input prep (idempotent): documents as ORC. */
  def stageOrc(s: SparkSession, dir: String): String = {
    val tmp = s"/tmp/graft_orc/${Staging.tag(dir)}"
    if (!new java.io.File(s"$tmp/_SUCCESS").exists())
      Tables.documents(s, dir).select(col("doc_id"), col("text"), col("source"))
        .write.mode("overwrite").orc(tmp)
    tmp
  }

  /** Columnar-format interop: the documents table written and read back
    * as ORC (Spark's other first-class columnar format — predicate
    * pushdown and column pruning work as on parquet). Values must
    * survive the trip exactly; the oracle reads the original parquet.
    */
  val orcRoundtrip = q("x_orc_roundtrip",
    "SELECT doc_id, text, source FROM documents") { (s, dir) =>
    s.read.orc(stageOrc(s, dir))
  }

  /** Cross-system reconciliation manifest — the data-contract check two
    * engines run independently and compare: per event_type, the row
    * count and an order-independent content checksum (sum of md5-prefix
    * integers over the business key). One partial-aggregated pass.
    *
    * The checksum accumulates as decimal(38,0) — each term is < 2^32,
    * so a 64-bit sum would silently wrap somewhere past ~4 billion rows
    * per event_type, i.e. exactly at the cross-system-reconciliation
    * scale where the manifest matters; 38 digits cannot overflow before
    * ~10^28 rows — and is SERIALIZED AS A DECIMAL STRING: integer-width
    * ladders differ per engine (DuckDB's sum(UBIGINT) is HUGEINT, which
    * pandas then degrades to float64), and the r11 driver run proved
    * that a manifest published in a width-dependent type hash-diverges
    * even when every value is equal. Digits are engine-invariant;
    * that invariance is the whole point of a reconciliation artifact.
    */
  val reconcileChecksum = q("x_reconcile_checksum",
    """SELECT event_type, count(*) AS n_rows,
      |       CAST(sum(CAST('0x' || substring(md5(CAST(event_id AS VARCHAR) || ':' ||
      |           CAST(user_id AS VARCHAR)), 1, 8) AS UBIGINT)) AS VARCHAR) AS checksum
      |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(conv(substring(md5(concat(col("event_id").cast("string"), lit(":"),
          col("user_id").cast("string"))), 1, 8), 16, 10).cast("decimal(38,0)"))
          .cast("string").as("checksum"))
  }

  /** Z-order clustering summary: orders mapped onto a 10-bit × 10-bit
    * Morton curve over (customer bucket, order-day bucket), then rolled
    * up per coarse curve cell (z >> 12). The min/max spans per cell ARE
    * the pruning statistics a z-clustered file layout gives every file:
    * narrow on BOTH dimensions — which is what makes footer-stats
    * pruning selective for predicates on either column. Bit
    * interleaving is pure codegen'd shifts and replays in SQL as a bit
    * sum ([[graft.ext.Layout.zOrder2]]); `LayoutSpec` covers the actual
    * file rewrite + per-file span narrowing. The oracle buckets with
    * `((x % m) + m) % m` — DuckDB's `%` follows the dividend's sign
    * while Spark's `pmod` is always non-negative, so a pre-epoch date
    * in a regenerated fixture would otherwise diverge (and a negative
    * bucket would sign-extend through the bit interleave).
    */
  val zorderCluster = q("x_zorder_cluster",
    """WITH d AS (
      |  SELECT ((o_custkey % 1024) + 1024) % 1024 AS xd,
      |         ((((CAST(o_orderdate AS DATE) - DATE '1995-01-01') % 1024) + 1024) % 1024) AS yd
      |  FROM orders),
      |z AS (
      |  SELECT xd, yd,
      |         (SELECT CAST(sum((((xd >> b.b) & 1) << (2*b.b)) + (((yd >> b.b) & 1) << (2*b.b+1))) AS BIGINT)
      |          FROM UNNEST(generate_series(0, 9)) AS b(b)) AS z
      |  FROM d)
      |SELECT z >> 12 AS zbucket, CAST(count(*) AS BIGINT) AS n,
      |       CAST(min(xd) AS BIGINT) AS x_min, CAST(max(xd) AS BIGINT) AS x_max,
      |       CAST(min(yd) AS BIGINT) AS y_min, CAST(max(yd) AS BIGINT) AS y_max
      |FROM z GROUP BY 1""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir).select(
      pmod(col("o_custkey"), lit(1024)).as("xd"),
      pmod(datediff(col("o_orderdate"), lit(java.sql.Date.valueOf("1995-01-01"))),
        lit(1024)).as("yd"))
    o.select(col("xd"), col("yd"),
        graft.ext.Layout.zOrder2(col("xd"), col("yd"), 10).as("z"))
      .groupBy(shiftright(col("z"), 12).as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("xd")).cast("long").as("x_min"), max(col("xd")).cast("long").as("x_max"),
        min(col("yd")).cast("long").as("y_min"), max(col("yd")).cast("long").as("y_max"))
  }

  /** Input prep (idempotent): documents deliberately shattered into 64
    * small files, then compacted by the real operator. */
  def stageCompacted(s: SparkSession, dir: String): String = {
    val base = s"/tmp/graft_layout/${Staging.tag(dir)}"
    val dst = s"$base/compacted"
    if (!new java.io.File(s"$dst/_SUCCESS").exists()) {
      val frag = s"$base/frag"
      Tables.documents(s, dir).select(col("doc_id"), col("text"), col("source"))
        .repartition(64).write.mode("overwrite").parquet(frag)
      graft.ext.Layout.compactParquet(s, frag, dst, targetBytes = 4L << 20)
    }
    dst
  }

  /** Small-file compaction roundtrip: the 64-way shattered documents
    * table compacted to ~4 MB files by [[graft.ext.Layout.compactParquet]]
    * must read back row-for-row identical to the source table (the
    * oracle reads the ORIGINAL parquet — only the physical layout may
    * change, never content). File-count/evenness mechanics are
    * LayoutSpec's; this gate pins the part users can lose data on.
    */
  val layoutCompact = q("x_layout_compact",
    "SELECT doc_id, text, source FROM documents") { (s, dir) =>
    s.read.parquet(stageCompacted(s, dir))
  }

  /** Input prep (idempotent): orders z-order-clustered into 16 files on
    * the (customer bucket, order-day bucket) Morton curve, with the
    * per-file min/max stats manifest written beside it — the persisted
    * layout whose payoff [[zonePrunedScan]] gates.
    */
  def stageZordered(s: SparkSession, dir: String): String = {
    val base = s"/tmp/graft_layout/${Staging.tag(dir)}"
    val dst = s"$base/zordered"
    if (!new java.io.File(s"$dst/_MANIFEST_DONE_v2_keys").exists()) {
      val o = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
        pmod(col("o_custkey"), lit(1024)).as("xd"),
        pmod(datediff(col("o_orderdate"),
          lit(java.sql.Date.valueOf("1995-01-01"))), lit(1024)).as("yd"))
      graft.ext.Layout.clusterByZOrder(o, col("xd"), col("yd"), bits = 10,
        dst, files = 16)
      // min/max zone stats on the curve dims, a key-membership
      // fingerprint on the order key (point lookups don't range-prune:
      // the z-layout scatters o_orderkey, so min/max spans cover
      // everything — the fingerprint is what skips files)
      graft.ext.Layout.writeManifest(s, dst, Seq("xd", "yd"),
        keyCols = Seq("o_orderkey"), keyBits = 256)
      new java.io.File(s"$dst/_MANIFEST_DONE_v2_keys").createNewFile()
    }
    dst
  }

  /** Point lookup through the per-file KEY fingerprint: three order
    * keys fetched from the z-ordered layout by pruning to the files
    * whose membership set contains each key's bucket — false positives
    * only, so the exact row filter on the pruned scan must hash-equal
    * the oracle's full-scan lookup (a fingerprint that wrongly skips a
    * file loses rows outright). The zone min/max stats are USELESS for
    * this predicate (the curve scatters the key) — the fingerprint is
    * the layer that makes hashed/high-cardinality point access cheap.
    */
  val zonePointLookup = q("x_zone_point_lookup",
    """SELECT o_orderkey, round(sum(o_totalprice), 2) AS total,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM orders WHERE o_orderkey IN (1, 1000, 5000)
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    val t = stageZordered(s, dir)
    val keys = Seq(1L, 1000L, 5000L)
    val keep = keys.map(k =>
      graft.ext.Layout.keyMember("o_orderkey", lit(k), keyBits = 256))
      .reduce(_ || _)
    val (pruned, _, _) = graft.ext.Layout.manifestPrunedRead(s, t, keep)
    pruned.filter(col("o_orderkey").isin(keys: _*))
      .groupBy(col("o_orderkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("total"),
        count(lit(1)).as("n"))
  }

  /** Data-skipping payoff of the z-order work (r13 VERDICT #4): a
    * selective rectangle predicate over the z-clustered orders layout
    * answered through the persisted per-file min/max manifest —
    * [[graft.ext.Layout.manifestPrunedRead]] turns the predicate into
    * an explicit file list BEFORE any scan (zone-map semantics), and
    * the result must hash-equal the oracle's FULL-scan replay: a
    * manifest that wrongly skips a file containing matches loses rows
    * and breaks the hash outright. LayoutSpec asserts files-read <
    * files-total on this same layout (the skip itself); at 100 TB this
    * is the difference between opening 40 files and 40,000.
    */
  val zonePrunedScan = q("x_zone_pruned_scan",
    """WITH d AS (
      |  SELECT o_orderstatus, o_totalprice,
      |         ((o_custkey % 1024) + 1024) % 1024 AS xd,
      |         ((((CAST(o_orderdate AS DATE) - DATE '1995-01-01') % 1024) + 1024) % 1024) AS yd
      |  FROM orders)
      |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
      |       round(sum(o_totalprice), 2) AS total
      |FROM d WHERE xd BETWEEN 96 AND 159 AND yd BETWEEN 192 AND 287
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    val t = stageZordered(s, dir)
    val (pruned, _, _) = graft.ext.Layout.manifestPrunedRead(s, t,
      col("max_xd") >= 96 && col("min_xd") <= 159 &&
        col("max_yd") >= 192 && col("min_yd") <= 287)
    pruned.filter(col("xd").between(96, 159) && col("yd").between(192, 287))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
  }

  /** Bloom semi-join reduction ([[graft.ext.Joins.bloomSemiJoin]]): the
    * fact side is pre-filtered by an engine-portable Bloom of the
    * dimension slice's keys BEFORE the join — at 100 TB that filter sits
    * under the exchange and the shuffle carries the ~5% that can match.
    * No false negatives by construction, so the gate's oracle is the
    * PLAIN join: any dropped true row breaks the hash, and the spec pins
    * that the filter actually prunes.
    */
  val bloomSemijoin = q("x_bloom_semijoin",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
      |       round(sum(l_quantity), 2) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderkey % 19 = 0
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    val dim = Tables.orders(s, dir)
      .filter(col("o_orderkey") % 19 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val filtered = graft.ext.Joins.bloomSemiJoin(
      Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_quantity")),
      col("l_orderkey"), dim, col("o_orderkey"))
    filtered.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
  }

  val all: Seq[QueryDef] =
    Seq(saltedJoin, saltedAgg, bucketedJoin, partitionedScan, jsonlRoundtrip,
      orcRoundtrip, reconcileChecksum, zorderCluster, layoutCompact,
      zonePrunedScan, zonePointLookup, bloomSemijoin)
}
