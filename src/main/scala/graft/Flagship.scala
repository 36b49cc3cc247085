package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Casts
import graft.operators._
import graft.registry._

/** Flagship end-to-end import (SURVEY §7.3 / EP1): CSV with typed columns +
  * a dot-notation relation column → header mapping → validation/cast with
  * row routing → broadcast relation resolution → upsert merge. One Spark
  * job chain, zero per-row lookups.
  */
object Flagship {

  val supplierImportCt = ContentType("api::supplier.supplier", "Supplier", Seq(
    Attribute("sname", AttrKind.StringK, required = true),
    Attribute("nation", AttrKind.RelationK, target = Some("api::nation.nation"),
      relationKind = Some("manyToOne")),
    Attribute("acctbal", AttrKind.DecimalK),
    Attribute("active", AttrKind.BooleanK, default = Some("true")),
  ))

  /** Builds a CSV from the supplier table (names + nation names + balances),
    * then runs the full import pipeline against the nation dimension and
    * upserts into an initially-empty target. Returns the merged table.
    */
  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val tmp = s"/tmp/graft_flagship/${graft.queries.Staging.tag(sfDir)}"
    // 1. produce the input CSV (supplier joined to its nation name)
    Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name").as("sname"), col("n_name").as("nation.name"),
        col("s_acctbal").cast("string").as("acctbal"))
      .write.mode("overwrite").option("header", true).csv(tmp)

    // 2. scan all-string (S1)
    val raw = spark.read.option("header", true)
      .schema("`sname` string, `nation.name` string, `acctbal` string")
      .csv(tmp)

    // 3. header mapping (P1-P3)
    val plan = HeaderMapper.plan(raw.columns.toSeq, supplierImportCt)
    require(plan.errors.isEmpty, plan.errors.mkString("; "))

    // 4. validate + cast + route (P4-P6)
    val validated = Validator.validate(raw, plan, supplierImportCt)

    // 5. resolve the relation (J1)
    val resolved = RelationResolver.resolveByField(
      validated.valid, "nation.name", Tables.nation(spark, sfDir),
      "n_nationkey", "n_name", "nation")
      .drop(Validator.RowNumCol)
      .drop("nation.name")

    // 6. upsert into empty target keyed by sname (S8/J4)
    val target = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], resolved.schema)
    Upsert.merge(target, resolved, "sname", upsert = true).merged
  }
}
