package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Casts
import graft.operators._
import graft.registry._

/** One driver-checkable query. `oracle` is equivalent ANSI/DuckDB SQL over
  * the same parquet tables; None ⇒ rows-only check.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

/** Parity queries: one per operator row of SURVEY.md §2, expressed over the
  * driver testdata tables so the DuckDB oracle can replay them.
  *
  * Column names are aliased identically in the Spark plan and the oracle SQL
  * (the driver's compare hashes by sorted column name).
  */
object ParityQueries {

  private def q(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame) =
    QueryDef(name, fn, Some(oracle))

  // ---------------------------------------------------------------- S1/S10
  /** CSV scan + CSV sink round-trip: parquet → csv (quoted) → all-string
    * read → typed casts. Covers S1 (header-ful scan, strings in), S10
    * (quote-escaped serialization), and the §1.3 rule that types come from
    * the target schema, not inference.
    */
  val s1CsvRoundtrip = q("s1_csv_roundtrip",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation") { (s, dir) =>
    val tmp = s"/tmp/graft_csv/${Staging.tag(dir)}/nation"
    Tables.nation(s, dir).write.mode("overwrite").option("header", true).csv(tmp)
    s.read.option("header", true)
      .schema("n_nationkey string, n_name string, n_regionkey string")
      .csv(tmp)
      .select(
        Casts.castInt(col("n_nationkey")).as("n_nationkey"),
        col("n_name"),
        Casts.castInt(col("n_regionkey")).as("n_regionkey"))
  }

  // ------------------------------------------------------------------- S3
  /** Entity lookup scan: filtered point read, deterministic `limit 1`
    * (reference limit-1 is order-undefined; we order by id — SURVEY §7.5.2).
    */
  val s3LookupScan = q("s3_lookup_scan",
    "SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 1 ORDER BY n_nationkey LIMIT 1") {
    (s, dir) =>
      Tables.nation(s, dir)
        .filter(col("n_regionkey") === 1)
        .orderBy("n_nationkey").limit(1)
        .select(col("n_nationkey"), col("n_name"))
  }

  // ------------------------------------------------------------------- S4
  /** Export scan with populated relations (J7) + export cap 1000 (L3). */
  val s4ExportScan = q("s4_export_populate",
    """SELECT c_custkey, c_name, n_name, r_name
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |ORDER BY c_custkey LIMIT 1000""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))
      .orderBy("c_custkey").limit(1000)
  }

  // ------------------------------------------------------------------- P4
  /** Required-field predicate over synthesized missing values. */
  val p4Required = q("p4_required_filter",
    """SELECT count(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) AS n_missing,
      |       count(*) AS n_total FROM customer""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .select(when(col("c_mktsegment") =!= "BUILDING", col("c_mktsegment")).as("seg"))
      .agg(
        count(when(Casts.isMissing(col("seg")), 1)).as("n_missing"),
        count(lit(1)).as("n_total"))
  }

  // ---------------------------------------------------------------- P5/P6
  private def orderImportCt = ContentType("api::order.order", "Order", Seq(
    Attribute("okey", AttrKind.BigIntegerK, required = true),
    Attribute("price", AttrKind.DecimalK),
    Attribute("odate", AttrKind.DateTimeK),
    Attribute("status", AttrKind.EnumerationK, enumValues = Seq("O", "F")),
  ))

  private def orderImportValidated(s: SparkSession, dir: String): Validator.Result = {
    val raw = Tables.orders(s, dir).select(
      col("o_orderkey").cast("string").as("okey"),
      col("o_totalprice").cast("string").as("price"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("odate"),
      col("o_orderstatus").as("status"))
    val ct = orderImportCt
    Validator.validate(raw, HeaderMapper.plan(raw.columns.toSeq, ct), ct)
  }

  /** Typed cast-with-error accumulation: status 'P' violates the enum,
    * everything else coerces cleanly (reference :127-197 semantics).
    */
  val p5CastErrors = q("p5_cast_errors",
    """SELECT o_orderkey, CASE WHEN o_orderstatus IN ('O','F') THEN 0 ELSE 1 END AS n_errors
      |FROM orders""".stripMargin) { (s, dir) =>
    orderImportValidated(s, dir).routed
      .select(col("okey").cast("long").as("o_orderkey"),
        size(col(Validator.ErrorsCol)).as("n_errors"))
  }

  /** Row routing valid/invalid split counts (A1-adjacent). Both counts come
    * from ONE aggregate over the routed frame — a single scan/job, not two
    * re-executions of the validation pipeline cross-joined.
    */
  val p6RowRouting = q("p6_row_routing",
    """SELECT count(CASE WHEN o_orderstatus IN ('O','F') THEN 1 END) AS n_valid,
      |       count(CASE WHEN o_orderstatus NOT IN ('O','F') THEN 1 END) AS n_invalid
      |FROM orders""".stripMargin) { (s, dir) =>
    orderImportValidated(s, dir).routed.agg(
      count(when(size(col(Validator.ErrorsCol)) === 0, 1)).as("n_valid"),
      count(when(size(col(Validator.ErrorsCol)) > 0, 1)).as("n_invalid"))
  }

  // ------------------------------------------------------------------- P2
  /** Unknown-column pruning: an unmapped header must vanish from the valid
    * frame (reference drops unknown columns, services/csv-import.js:78-84,
    * :102). The surviving column SET is emitted as data so the oracle
    * asserts the pruned schema, and the count proves rows still flow.
    */
  val p2UnknownPruning = q("p2_unknown_pruning",
    """SELECT 'odate,okey,price,status' AS valid_columns, count(*) AS n_rows
      |FROM orders""".stripMargin) { (s, dir) =>
    val raw = Tables.orders(s, dir).select(
      col("o_orderkey").cast("string").as("okey"),
      col("o_totalprice").cast("string").as("price"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("odate"),
      col("o_orderstatus").as("status"),
      lit("zzz").as("mystery")) // unknown header — must be pruned
    val ct = orderImportCt
    val res = Validator.validate(raw, HeaderMapper.plan(raw.columns.toSeq, ct), ct)
    val survived = res.valid.drop(Validator.RowNumCol).columns.sorted.mkString(",")
    res.routed.agg(count(lit(1)).as("n_rows"))
      .select(lit(survived).as("valid_columns"), col("n_rows"))
  }

  // ------------------------------------------------------------------- P9
  /** System-file filter over synthesized ZIP-entry names. */
  val p9SystemFiles = q("p9_system_file_filter",
    "SELECT doc_id FROM documents WHERE doc_id % 5 = 0 OR doc_id % 5 = 4") { (s, dir) =>
    val named = Tables.documents(s, dir).select(col("doc_id"),
      when(col("doc_id") % 5 === 1, concat(lit("._hidden_"), col("doc_id"), lit(".txt")))
        .when(col("doc_id") % 5 === 2, concat(lit("__MACOSX/f"), col("doc_id")))
        .when(col("doc_id") % 5 === 3, lit(".DS_Store"))
        .otherwise(concat(lit("file_"), col("doc_id"), lit(".pdf"))).as("name"))
    named.filter(!Media.isSystemFile(col("name"))).select(col("doc_id"))
  }

  // ------------------------------------------------------------------- J1
  /** Scalar relation with explicit search field: eqi join + containsi
    * fallback + min-id tie-break, driven through RelationResolver.
    * Every 10th customer carries a truncated name ('TION_7') that only the
    * contains fallback can resolve (possibly ambiguously ⇒ min id).
    */
  val j1RelationEqi = q("j1_relation_eqi",
    """WITH inc AS (
      |  SELECT c_custkey,
      |         CASE WHEN c_custkey % 10 = 0 THEN substr(n_name, 3) ELSE n_name END AS val
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
      |ex AS (
      |  SELECT i.c_custkey, min(n.n_nationkey) AS id
      |  FROM inc i LEFT JOIN nation n ON lower(i.val) = lower(n.n_name)
      |  GROUP BY i.c_custkey),
      |ct AS (
      |  SELECT i.c_custkey, min(n.n_nationkey) AS id
      |  FROM inc i JOIN nation n ON contains(lower(n.n_name), lower(i.val))
      |  GROUP BY i.c_custkey)
      |SELECT e.c_custkey AS c_custkey, coalesce(e.id, ct.id) AS resolved_id
      |FROM ex e LEFT JOIN ct ON e.c_custkey = ct.c_custkey""".stripMargin) { (s, dir) =>
    val incoming = Tables.customer(s, dir)
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"),
        when(col("c_custkey") % 10 === 0, expr("substr(n_name, 3)"))
          .otherwise(col("n_name")).as("val"))
    RelationResolver.resolveByField(incoming, "val", Tables.nation(s, dir),
      "n_nationkey", "n_name", "resolved_id")
      .select(col("c_custkey"), col("resolved_id"))
  }

  // ------------------------------------------------------------------- J2
  /** Bare-value fallback cascade: numeric ⇒ id join; text ⇒ common-field
    * cascade (n_name); garbage ⇒ null.
    */
  val j2Cascade = q("j2_fallback_cascade",
    """SELECT c_custkey,
      |       CASE WHEN c_custkey % 3 IN (0, 1) THEN CAST(c_nationkey AS BIGINT) END AS resolved_id
      |FROM customer""".stripMargin) { (s, dir) =>
    val incoming = Tables.customer(s, dir)
      .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"),
        when(col("c_custkey") % 3 === 0, col("c_nationkey").cast("string"))
          .when(col("c_custkey") % 3 === 1, upper(col("n_name")))
          .otherwise(concat(lit("unknown-"), col("c_custkey"))).as("val"))
    RelationResolver.resolveBare(incoming, "val", Tables.nation(s, dir),
      "n_nationkey", "resolved_id", commonFields = Seq("n_name"))
      .select(col("c_custkey"), col("resolved_id"))
  }

  // ------------------------------------------------------------------- J3
  /** Multi relation: comma-split values, per-element resolution, ordered id
    * collection (A3).
    */
  val j3Multi = q("j3_multi_relation",
    """SELECT c_custkey,
      |       CAST(c_nationkey AS VARCHAR) || ',' || CAST((c_nationkey + 7) % 25 AS VARCHAR) AS resolved_ids
      |FROM customer""".stripMargin) { (s, dir) =>
    val nation = Tables.nation(s, dir)
    val n1 = nation.select(col("n_nationkey").as("k1"), col("n_name").as("name1"))
    val n2 = nation.select(col("n_nationkey").as("k2"), col("n_name").as("name2"))
    val incoming = Tables.customer(s, dir)
      .join(n1, col("c_nationkey") === col("k1"))
      .join(n2, (col("c_nationkey") + 7) % 25 === col("k2"))
      .select(col("c_custkey"), concat(col("name1"), lit(" , "), col("name2")).as("val"))
    RelationResolver.resolveMultiByField(incoming, "val", nation,
      "n_nationkey", "n_name", "ids")
      .select(col("c_custkey"),
        array_join(transform(col("ids"), _.cast("string")), ",").as("resolved_ids"))
  }

  // ---------------------------------------------------------------- S8/J4
  private def upsertMerged(s: SparkSession, dir: String): Upsert.MergeResult = {
    val orders = Tables.orders(s, dir)
    val target = orders.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("okey"), col("o_totalprice").as("price"))
    val incoming = orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").as("okey"), (col("o_totalprice") + 1).as("price"))
    Upsert.merge(target, incoming, "okey", upsert = true)
  }

  /** Upsert MERGE emulation: anti-join keep ∪ incoming; update-else-create. */
  val s8Upsert = q("s8_upsert_merge",
    """SELECT o_orderkey AS okey,
      |       round(CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 1 ELSE o_totalprice END, 2) AS price
      |FROM orders WHERE o_orderkey % 3 = 0 OR o_orderkey % 2 = 0""".stripMargin) { (s, dir) =>
    upsertMerged(s, dir).merged.select(col("okey"), round(col("price"), 2).as("price"))
  }

  /** Import result counters (A1): created/updated from one aggregate. */
  val a1Counters = q("a1_import_counters",
    """SELECT count(CASE WHEN o_orderkey % 2 = 0 AND o_orderkey % 3 <> 0 THEN 1 END) AS n_created,
      |       count(CASE WHEN o_orderkey % 6 = 0 THEN 1 END) AS n_updated
      |FROM orders""".stripMargin) { (s, dir) =>
    val r = upsertMerged(s, dir)
    import s.implicits._
    Seq((r.created, r.updated)).toDF("n_created", "n_updated")
  }

  // ------------------------------------------------------------------- J6
  /** Media↔record matching: filename key extraction + equi join, ids sorted
    * by (name, id) per record (A4/F13). Covers the exact/`_N`/prefix
    * patterns via the three synthesized filename shapes.
    */
  val j6MediaMatch = q("j6_media_match",
    """WITH files AS (
      |  SELECT o_orderkey AS fid, o_custkey,
      |         'CH' || CAST(o_custkey AS VARCHAR) ||
      |         CASE WHEN o_orderkey % 3 = 0 THEN '.pdf'
      |              WHEN o_orderkey % 3 = 1 THEN '_' || CAST(o_orderkey % 5 AS VARCHAR) || '.png'
      |              ELSE '_report.jpg' END AS fname
      |  FROM orders)
      |SELECT c.c_custkey,
      |       string_agg(CAST(f.fid AS VARCHAR), ',' ORDER BY f.fname, f.fid) AS file_ids
      |FROM customer c JOIN files f ON f.o_custkey = c.c_custkey
      |GROUP BY c.c_custkey""".stripMargin) { (s, dir) =>
    val files = Tables.orders(s, dir).select(
      col("o_orderkey").as("fid"),
      concat(lit("CH"), col("o_custkey").cast("string"),
        when(col("o_orderkey") % 3 === 0, lit(".pdf"))
          .when(col("o_orderkey") % 3 === 1,
            concat(lit("_"), (col("o_orderkey") % 5).cast("string"), lit(".png")))
          .otherwise(lit("_report.jpg"))).as("fname"))
    val records = Tables.customer(s, dir)
      .select(col("c_custkey"), concat(lit("ch"), col("c_custkey").cast("string")).as("key"))
    Media.matchFiles(records, "key", files, "fname", "fid", "matched")
      .filter(col("matched").isNotNull)
      .select(col("c_custkey"),
        array_join(transform(col("matched"), _.cast("string")), ",").as("file_ids"))
  }

  // ------------------------------------------------------------ F2/F3/F5/F11
  val f2Containsi = q("f2_containsi",
    "SELECT p_partkey FROM part WHERE contains(lower(p_name), 'red')") { (s, dir) =>
    Tables.part(s, dir).filter(lower(col("p_name")).contains("red")).select(col("p_partkey"))
  }

  val f3SplitTrim = q("f3_split_trim",
    """SELECT trim(tok) AS token, count(*) AS cnt
      |FROM (SELECT unnest(string_split(p_brand || ' , ' || p_type, ',')) AS tok FROM part)
      |GROUP BY trim(tok)""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .select(explode(Casts.splitTrim(concat(col("p_brand"), lit(" , "), col("p_type")))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
  }

  val f5IsoFormat = q("f5_iso_format",
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') || '.000Z' AS iso
      |FROM orders WHERE o_orderkey < 100""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).filter(col("o_orderkey") < 100)
      .select(col("o_orderkey"), Casts.isoString(col("o_orderdate")).as("iso"))
  }

  /** Many-relation values comma-joined on export (F11/N5) with sorted
    * collection (F13/A4).
    */
  val f11ArrayJoin = q("f11_array_join",
    """SELECT r_name, string_agg(n_name, ', ' ORDER BY n_name) AS members
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin) { (s, dir) =>
    Tables.nation(s, dir)
      .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), ", ").as("members"))
  }

  // ------------------------------------------------------------------- L1
  /** Deterministic first-match (limit-1 replacement): first order per
    * customer by (date, key).
    */
  val l1FirstMatch = q("l1_first_match",
    """SELECT o_custkey, o_orderkey AS first_order FROM (
      |  SELECT o_custkey, o_orderkey,
      |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders) WHERE rn = 1""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("first_order"))
  }

  /** All parity queries in registration order. */
  val all: Seq[QueryDef] = Seq(
    s1CsvRoundtrip, s3LookupScan, s4ExportScan,
    p2UnknownPruning, p4Required, p5CastErrors, p6RowRouting, p9SystemFiles,
    j1RelationEqi, j2Cascade, j3Multi, s8Upsert, a1Counters, j6MediaMatch,
    f2Containsi, f3SplitTrim, f5IsoFormat, f11ArrayJoin, l1FirstMatch,
  )
}
