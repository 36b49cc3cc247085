package graft.operators

import graft.{Fixtures, SparkSpec}
import org.apache.spark.sql.functions._

/** Validation/cast semantics (reference: tests/services/csv-import.test.js:65-158
  * and fixtures sample-users.csv / invalid-data.csv — see FIXTURES.md §2).
  */
class ValidatorSpec extends SparkSpec {
  import spark.implicits._

  private def companyPlan(headers: Seq[String]) =
    HeaderMapper.plan(headers, Fixtures.company)

  test("happy path: boolean forms true/false/yes/1, int and email casts") {
    val df = Seq(
      ("John Doe", "john@example.com", "30", "true"),
      ("Jane Smith", "jane@example.com", "25", "false"),
      ("Bob Johnson", "bob@example.com", "35", "yes"),
      ("Alice Brown", "alice@example.com", "28", "1"),
    ).toDF("name", "email", "established", "active")
    val res = Validator.validate(df, companyPlan(df.columns.toSeq), Fixtures.company)
    res.invalid.count() shouldBe 0
    val rows = res.valid.orderBy("__rownum").collect()
    rows.map(_.getAs[Boolean]("active")).toSeq shouldBe Seq(true, false, true, true)
    rows.map(_.getAs[Int]("established")).toSeq shouldBe Seq(30, 25, 35, 28)
  }

  test("error accumulation: each bad field produces a Row N message; rows route to invalid") {
    val df = Seq(
      ("John Doe", "invalid-email", "not-a-number", "maybe"),
      ("Jane Smith", "", "thirty", "sure"),
      ("", "missing@email.com", "25", "false"),
    ).toDF("name", "email", "established", "active")
    val res = Validator.validate(df, companyPlan(df.columns.toSeq), Fixtures.company)
    res.valid.count() shouldBe 0
    val inv = res.invalid.orderBy("__rownum").collect()
    inv should have length 3
    val errs1 = inv(0).getSeq[String](inv(0).fieldIndex("__errors"))
    errs1.exists(_.contains("valid email")) shouldBe true
    errs1.exists(_.contains("valid integer")) shouldBe true
    errs1.exists(_.contains("valid boolean")) shouldBe true
    val errs3 = inv(2).getSeq[String](inv(2).fieldIndex("__errors"))
    errs3.exists(e => e.contains("\"name\"") && e.contains("required")) shouldBe true
  }

  test("default applies when value missing; empty string is missing") {
    val df = Seq(("Acme", "", "")).toDF("name", "established", "active")
    val res = Validator.validate(df, companyPlan(df.columns.toSeq), Fixtures.company)
    val row = res.valid.collect().head
    row.getAs[Boolean]("active") shouldBe true // default "true"
    row.isNullAt(row.fieldIndex("established")) shouldBe true
  }

  test("unknown columns are pruned from the valid frame") {
    val df = Seq(("Acme", "zzz")).toDF("name", "mystery")
    val plan = companyPlan(df.columns.toSeq)
    val res = Validator.validate(df, plan, Fixtures.company)
    res.valid.columns should not contain "mystery"
  }

  test("timestamp cast accepts ISO and common forms, rejects garbage") {
    import graft.functions.Casts
    val df = Seq("2023-01-15", "2023-01-15T10:30:00.000Z", "not-a-date")
      .toDF("v").select(Casts.castTimestamp($"v").as("ts"))
    val got = df.collect().map(r => Option(r.get(0)))
    got(0).isDefined shouldBe true
    got(1).isDefined shouldBe true
    got(2).isDefined shouldBe false
  }
}
