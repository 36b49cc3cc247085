package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.api.Engine
import graft.registry._

/** End-to-end endpoint queries driven through the Engine façade (EP1/EP3),
  * so the full pipeline composition — not just individual operators — sits
  * under the DuckDB oracle gate.
  */
object EngineQueries {

  private def q(name: String, oracle: String)(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame) =
    QueryDef(name, fn, Some(oracle))

  private val nationCt = ContentType("api::nation.nation", "Nation", Seq(
    Attribute("n_name", AttrKind.StringK, required = true, unique = true)))
  private val supplierCt = ContentType("api::supplier.supplier", "Supplier", Seq(
    Attribute("sname", AttrKind.StringK, required = true),
    Attribute("nation", AttrKind.RelationK, target = Some("api::nation.nation"),
      relationKind = Some("manyToOne")),
    Attribute("acctbal", AttrKind.DecimalK),
    Attribute("active", AttrKind.BooleanK, default = Some("true"))))
  private val registry = ContentTypeRegistry(Seq(nationCt, supplierCt))

  /** EP1: CSV-shaped strings → validate → resolve `nation.name` → merge. */
  val ep1Import = q("ep1_engine_import",
    """SELECT s_name AS sname, CAST(s_nationkey AS BIGINT) AS nation,
      |       round(s_acctbal, 2) AS acctbal,
      |       (s_suppkey % 2 = 0) AS active
      |FROM supplier""".stripMargin) { (s, dir) =>
    val nation = Tables.nation(s, dir)
    val csv = Tables.supplier(s, dir)
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name").as("sname"),
        col("n_name").as("nation.n_name"),
        col("s_acctbal").cast("string").as("acctbal"),
        when(col("s_suppkey") % 2 === 0, "yes").otherwise("0").as("active"))
    val target = s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("sname", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("nation", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("acctbal", org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("active", org.apache.spark.sql.types.BooleanType))))
    val engine = new Engine(s, registry, {
      case "api::nation.nation" => (nation, "n_nationkey")
      case "api::supplier.supplier" => (target, "sname")
    })
    engine.importCsv(csv, "api::supplier.supplier", upsert = true, upsertField = "sname")
      .merged
      .select(col("sname"), col("nation"), round(col("acctbal"), 2).as("acctbal"), col("active"))
  }

  /** EP3: stored table → populate relation display → flatten → audit drop. */
  val ep3Export = q("ep3_engine_export",
    """SELECT s_suppkey, s_name AS sname, n_name AS nation_name
      |FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey""".stripMargin) { (s, dir) =>
    val nation = Tables.nation(s, dir)
    val stored = Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_name").as("sname"),
        col("s_nationkey").cast("long").as("nation"), lit("2024").as("createdAt"))
    val engine = new Engine(s, registry, {
      case "api::nation.nation" => (nation, "n_nationkey")
      case "api::supplier.supplier" => (stored, "s_suppkey")
    })
    engine.exportCsv("api::supplier.supplier", limit = 100000)
      .withColumnRenamed("nation.n_name", "nation_name")
  }

  val all: Seq[QueryDef] = Seq(ep1Import, ep3Export)
}
