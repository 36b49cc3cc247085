package graft

import graft.registry._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Mock catalog + row sets mirroring the reference's test harness
  * (reference: tests/helpers/setup.js:5-42, tests/fixtures/test-data.js).
  * See FIXTURES.md.
  */
object Fixtures {

  val country = ContentType(
    uid = "api::country.country",
    displayName = "Country",
    attributes = Seq(
      Attribute("name", AttrKind.StringK, required = true),
      Attribute("code", AttrKind.StringK, unique = true),
    ),
  )

  val company = ContentType(
    uid = "api::company.company",
    displayName = "Company",
    attributes = Seq(
      Attribute("name", AttrKind.StringK, required = true),
      Attribute("country", AttrKind.RelationK, target = Some("api::country.country"),
        relationKind = Some("manyToOne")),
      Attribute("established", AttrKind.IntegerK),
      Attribute("active", AttrKind.BooleanK, default = Some("true")),
      Attribute("email", AttrKind.EmailK),
    ),
  )

  val address = ComponentType(
    uid = "test.address",
    attributes = Seq(
      Attribute("street", AttrKind.StringK),
      Attribute("city", AttrKind.StringK),
      Attribute("country", AttrKind.RelationK, target = Some("api::country.country"),
        relationKind = Some("manyToOne")),
    ),
  )

  val person = ContentType(
    uid = "api::person.person",
    displayName = "Person",
    attributes = Seq(
      Attribute("fullName", AttrKind.StringK, required = true),
      Attribute("address", AttrKind.ComponentK, component = Some("test.address")),
      Attribute("stops", AttrKind.ComponentK, component = Some("test.address"), repeatable = true),
      Attribute("countries", AttrKind.RelationK, target = Some("api::country.country"),
        relationKind = Some("manyToMany")),
    ),
  )

  val registry: ContentTypeRegistry =
    ContentTypeRegistry(Seq(country, company, person), Seq(address))

  /** Seed dimension rows (FIXTURES.md §1). */
  def countryDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((1L, "India", "IN"), (2L, "United States", "US"), (3L, "China", "CN"))
      .toDF("id", "name", "code")
  }
}
