package graft.operators

import graft.{Fixtures, SparkSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Component assembly semantics (reference: tests/fixtures/
  * sample-with-components.csv and parseComponentRows — FIXTURES.md §2).
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private val lookup: Components.RelationLookup = (df, valueCol, _, searchField, out) =>
    RelationResolver.resolveByField(df, valueCol, Fixtures.countryDf(spark), "id",
      searchField, out)

  test("single component assembles struct; all-empty component is null") {
    val df = Seq(
      ("p1", "5th Ave", "NYC"),
      ("p2", "", ""),
    ).toDF("fullName", "address.street", "address.city")
    val plan = HeaderMapper.plan(df.columns.toSeq, Fixtures.person)
    val srcs = Components.sourcesFromPlan(plan, Fixtures.registry)
    srcs should have size 1
    val out = Components.assemble(df, srcs.head, lookup).orderBy("fullName").collect()
    val a1 = out(0).getStruct(out(0).fieldIndex("address"))
    a1.getAs[String]("street") shouldBe "5th Ave"
    a1.getAs[String]("city") shouldBe "NYC"
    out(1).isNullAt(out(1).fieldIndex("address")) shouldBe true
  }

  test("component.relation.field grammar resolves inner relation") {
    val df = Seq(("p1", "Main St", "india")).toDF("fullName", "address.street", "address.country.name")
    val plan = HeaderMapper.plan(df.columns.toSeq, Fixtures.person)
    val srcs = Components.sourcesFromPlan(plan, Fixtures.registry)
    val out = Components.assemble(df, srcs.head, lookup).collect().head
    val a = out.getStruct(out.fieldIndex("address"))
    a.getAs[Long]("country") shouldBe 1L
    a.getAs[String]("street") shouldBe "Main St"
  }

  test("repeatable component zips ragged comma-lists; all-empty rows dropped") {
    val df = Seq(
      ("r1", "A St,B St", "X,Y"),
      ("r2", "C St", "Z,W"), // ragged: street list shorter
      ("r3", "", ""),
    ).toDF("fullName", "stops.street", "stops.city")
    val plan = HeaderMapper.plan(df.columns.toSeq, Fixtures.person)
    val srcs = Components.sourcesFromPlan(plan, Fixtures.registry)
    val out = Components.assemble(df, srcs.head, lookup).orderBy("fullName").collect()

    def stops(r: Row): Seq[Row] = r.getSeq[Row](r.fieldIndex("stops"))
    val s1 = stops(out(0))
    s1.map(_.getAs[String]("street")) shouldBe Seq("A St", "B St")
    s1.map(_.getAs[String]("city")) shouldBe Seq("X", "Y")
    val s2 = stops(out(1))
    s2 should have size 2 // ragged zip pads with null, row kept (city present)
    s2(1).getAs[String]("street") shouldBe null
    s2(1).getAs[String]("city") shouldBe "W"
    Option(out(2).getAs[Any]("stops")) shouldBe None // all-empty ⇒ null
  }
}
