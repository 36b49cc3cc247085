package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators._
import graft.registry._

/** Parity queries for the nested-data operators (SURVEY §2.5: N1-N5, J5). */
object ComponentQueries {

  private def q(name: String, oracle: String)(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame) =
    QueryDef(name, fn, Some(oracle))

  /** N1/N2/N4: single-component assembly from dot-notation columns, then
    * export flatten back to scalar columns.
    */
  val n2SingleAssembly = q("n2_component_assembly",
    """SELECT s_name AS lname, 'S-' || CAST(s_suppkey AS VARCHAR) AS addr_street,
      |       CAST(s_suppkey % 100 AS INTEGER) AS addr_zip
      |FROM supplier""".stripMargin) { (s, dir) =>
    val addr2 = ComponentType("test.addr2", Seq(
      Attribute("street", AttrKind.StringK),
      Attribute("zip", AttrKind.IntegerK)))
    val ct = ContentType("api::loc.loc", "Loc", Seq(
      Attribute("lname", AttrKind.StringK, required = true),
      Attribute("addr", AttrKind.ComponentK, component = Some("test.addr2"))))
    val registry = ContentTypeRegistry(Seq(ct), Seq(addr2))

    val raw = Tables.supplier(s, dir).select(
      col("s_name").as("lname"),
      concat(lit("S-"), col("s_suppkey").cast("string")).as("addr.street"),
      (col("s_suppkey") % 100).cast("string").as("addr.zip"))
    val plan = HeaderMapper.plan(raw.columns.toSeq, ct)
    val srcs = Components.sourcesFromPlan(plan, registry)
    val assembled = Components.assemble(raw, srcs.head,
      (df, _, _, _, out) => df.withColumn(out, lit(null).cast("long")))
    Exporter.flattenSingleComponent(assembled, "addr")
      .withColumnRenamed("addr.street", "addr_street")
      .withColumnRenamed("addr.zip", "addr_zip")
  }

  /** N3 + J5: repeatable-component zip of parallel comma-lists with an inner
    * relation resolved against the nation dimension.
    */
  val n3RepeatableZip = q("n3_component_zip",
    """SELECT c_custkey, 0 AS pos, CAST(c_nationkey AS BIGINT) AS nat, round(c_acctbal, 2) AS qty
      |FROM customer
      |UNION ALL
      |SELECT c_custkey, 1, CAST((c_nationkey + 1) % 25 AS BIGINT), round(c_acctbal + 1, 2)
      |FROM customer""".stripMargin) { (s, dir) =>
    val dq = ComponentType("test.dq", Seq(
      Attribute("nat", AttrKind.RelationK, target = Some("api::nation.nation"),
        relationKind = Some("manyToOne")),
      Attribute("qty", AttrKind.DecimalK)))
    val ct = ContentType("api::chal.chal", "Chal", Seq(
      Attribute("cname", AttrKind.StringK, required = true),
      Attribute("dq", AttrKind.ComponentK, component = Some("test.dq"), repeatable = true)))
    val registry = ContentTypeRegistry(Seq(ct), Seq(dq))

    val nation = Tables.nation(s, dir)
    val n1 = nation.select(col("n_nationkey").as("k1"), col("n_name").as("nm1"))
    val n2 = nation.select(col("n_nationkey").as("k2"), col("n_name").as("nm2"))
    val raw = Tables.customer(s, dir)
      .join(n1, col("c_nationkey") === col("k1"))
      .join(n2, (col("c_nationkey") + 1) % 25 === col("k2"))
      .select(
        col("c_custkey").cast("string").as("cname"),
        concat(col("nm1"), lit(","), col("nm2")).as("dq.nat.n_name"),
        concat(col("c_acctbal").cast("string"), lit(","),
          (col("c_acctbal") + 1).cast("string")).as("dq.qty"))
    val plan = HeaderMapper.plan(raw.columns.toSeq, ct)
    val srcs = Components.sourcesFromPlan(plan, registry)
    val lookup: Components.RelationLookup = (df, valueCol, _, searchField, out) =>
      RelationResolver.resolveByField(df, valueCol, nation, "n_nationkey", searchField, out,
        enableContains = false)
    Components.assemble(raw, srcs.head, lookup)
      .select(col("cname").cast("long").as("c_custkey"), posexplode(col("dq")).as(Seq("pos", "e")))
      .select(col("c_custkey"), col("pos"),
        col("e.nat").as("nat"), round(col("e.qty"), 2).as("qty"))
  }

  /** N4: repeatable-component export flatten to 1-based `field.{i}.key`. */
  val n4RepeatableFlatten = q("n4_repeatable_flatten",
    """SELECT c_custkey, CAST(c_custkey * 10 AS BIGINT) AS itm_1_v,
      |       CAST(c_custkey * 10 + 1 AS BIGINT) AS itm_2_v
      |FROM customer""".stripMargin) { (s, dir) =>
    val df = Tables.customer(s, dir).select(col("c_custkey"),
      array(
        struct((col("c_custkey") * 10).cast("long").as("v")),
        struct((col("c_custkey") * 10 + 1).cast("long").as("v"))).as("itm"))
    val max = Exporter.maxArraySize(df, "itm")
    Exporter.flattenRepeatableComponent(df, "itm", max)
      .withColumnRenamed("itm.1.v", "itm_1_v")
      .withColumnRenamed("itm.2.v", "itm_2_v")
  }

  /** N5/J7 scalar: relation populated to its display attribute on export. */
  val n5RelationFlatten = q("n5_relation_flatten",
    """SELECT s_suppkey, s_name, n_name AS nation_name
      |FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey""".stripMargin) { (s, dir) =>
    val stored = Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey").as("nation"))
    Exporter.populateRelation(stored, "nation", Tables.nation(s, dir), "n_nationkey", "n_name")
      .withColumnRenamed("nation.n_name", "nation_name")
  }

  /** N5/F11 multi: id-array relation flattened to comma-joined display
    * values in array order.
    */
  val n5MultiFlatten = q("n5_multi_flatten",
    """SELECT n_regionkey, string_agg(n_name, ', ' ORDER BY n_nationkey) AS member_names
      |FROM nation GROUP BY n_regionkey""".stripMargin) { (s, dir) =>
    val nation = Tables.nation(s, dir)
    val stored = nation.groupBy(col("n_regionkey"))
      .agg(sort_array(collect_list(col("n_nationkey").cast("long"))).as("members"))
    Exporter.populateMultiRelation(stored, "members", nation, "n_nationkey", "n_name")
      .withColumnRenamed("members.n_name", "member_names")
  }

  val all: Seq[QueryDef] = Seq(
    n2SingleAssembly, n3RepeatableZip, n4RepeatableFlatten, n5RelationFlatten, n5MultiFlatten)
}
