package graft.api

import graft.{Fixtures, SparkSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end endpoint behavior (reference: tests/controllers/
  * csv-import.test.js and tests/integration/full-workflow.test.js shapes).
  */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val countryTable = Fixtures.countryDf(spark)
  private lazy val emptyCompanies: DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("name", StringType), StructField("country", LongType),
        StructField("established", IntegerType), StructField("active", BooleanType),
        StructField("email", StringType))))
  }

  private def engine = new Engine(spark, Fixtures.registry, {
    case "api::country.country" => (countryTable, "id")
    case "api::company.company" => (emptyCompanies, "name")
    case other => throw new NoSuchElementException(other)
  })

  test("contentTypes lists only api:: namespace") {
    engine.contentTypes.map(_.uid) shouldBe
      Seq("api::company.company", "api::country.country", "api::person.person")
  }

  test("preview returns headers and first rows without validation") {
    val csv = Seq(("x", "nonsense"), ("y", "alsobad")).toDF("name", "established")
    val (headers, rows) = engine.preview(csv, 1)
    headers shouldBe Seq("name", "established")
    rows should have length 1
  }

  test("validate reports schema errors, warnings, and invalid rows") {
    val csv = Seq(("Acme", "2010", "yes", "a@b.co", "zz"))
      .toDF("name", "established", "active", "email", "unknown_col")
    val rep = engine.validate(csv, "api::company.company")
    rep.valid shouldBe true // unknown col is only a warning
    rep.warnings.exists(_.contains("unknown_col")) shouldBe true

    val bad = Seq(("", "notanum", "maybe", "bademail", "x"))
      .toDF("name", "established", "active", "email", "unknown_col")
    val rep2 = engine.validate(bad, "api::company.company")
    rep2.valid shouldBe false
    rep2.invalidRows shouldBe 1
  }

  test("importCsv resolves relation via dot notation and counts creates") {
    val csv = Seq(
      ("Comp A", "india", "2000", "true"),
      ("Comp B", "UNITED STATES", "2001", "no"),
      ("Comp C", "Atlantis", "2002", "yes"), // relation miss ⇒ null country
    ).toDF("name", "country.name", "established", "active")
    val res = engine.importCsv(csv, "api::company.company", upsert = true, upsertField = "name")
    res.created shouldBe 3
    res.updated shouldBe 0
    val rows = res.merged.orderBy("name").collect()
    rows.map(r => Option(r.getAs[Any]("country"))) shouldBe
      Seq(Some(1L), Some(2L), None)
    rows.map(_.getAs[Boolean]("active")).toSeq shouldBe Seq(true, false, true)
  }

  test("importCsv upsert updates existing keys (last write wins)") {
    val existing = Seq(("Comp A", 1L, 1999, true, null.asInstanceOf[String]))
      .toDF("name", "country", "established", "active", "email")
    val eng = new Engine(spark, Fixtures.registry, {
      case "api::country.country" => (countryTable, "id")
      case "api::company.company" => (existing, "name")
    })
    val csv = Seq(("Comp A", "china", "2020", "yes"), ("Comp D", "india", "2021", "no"))
      .toDF("name", "country.name", "established", "active")
    val res = eng.importCsv(csv, "api::company.company", upsert = true, upsertField = "name")
    res.created shouldBe 1
    res.updated shouldBe 1
    val a = res.merged.filter(col("name") === "Comp A").collect().head
    a.getAs[Long]("country") shouldBe 3L // updated to china
    res.merged.count() shouldBe 2
  }

  test("importCsv assembles components with inner relations (three-segment grammar)") {
    import org.apache.spark.sql.types._
    val emptyPersons = spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("fullName", StringType))))
    val eng = new Engine(spark, Fixtures.registry, {
      case "api::country.country" => (countryTable, "id")
      case "api::person.person" => (emptyPersons, "fullName")
    })
    val csv = Seq(
      ("Ada", "Main St", "NYC", "united states"),
      ("Bob", "", "", ""),
    ).toDF("fullName", "address.street", "address.city", "address.country.name")
    val res = eng.importCsv(csv, "api::person.person", upsert = true, upsertField = "fullName")
    res.created shouldBe 2
    val rows = res.merged.orderBy("fullName").collect()
    val ada = rows(0).getStruct(rows(0).fieldIndex("address"))
    ada.getAs[String]("street") shouldBe "Main St"
    ada.getAs[Long]("country") shouldBe 2L // resolved against countries
    rows(1).isNullAt(rows(1).fieldIndex("address")) shouldBe true // all-empty ⇒ null
  }

  test("importCsv aborts on schema-level validation failure (gate)") {
    val csv = Seq(("2000")).toDF("established") // required name missing
    an[IllegalArgumentException] should be thrownBy
      engine.importCsv(csv, "api::company.company")
  }

  test("exportCsv populates relation display and drops audit columns") {
    val stored = Seq(
      ("Comp A", 1L, 2000, true, "a@b.co", "2024-01-01"),
      ("Comp B", 99L, 2001, false, "b@b.co", "2024-01-02"),
    ).toDF("name", "country", "established", "active", "email", "createdAt")
    val eng = new Engine(spark, Fixtures.registry, {
      case "api::country.country" => (countryTable, "id")
      case "api::company.company" => (stored, "name")
    })
    val out = eng.exportCsv("api::company.company")
    out.columns should contain("country.name")
    out.columns should not contain "createdAt"
    val rows = out.orderBy("name").collect()
    rows(0).getAs[String]("country.name") shouldBe "India"
    rows(1).getAs[String]("country.name") shouldBe null // miss ⇒ empty
  }
}
