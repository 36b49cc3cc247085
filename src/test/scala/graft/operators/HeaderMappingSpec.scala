package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.Fixtures
import graft.operators.HeaderMapping._

/** Ports the header-mapping cases of the reference's service tests
  * (reference: tests/services/csv-import.test.js:161-192).
  */
class HeaderMappingSpec extends AnyFunSuite with Matchers {

  test("plain headers map directly; unknown headers are invalid") {
    val plan = HeaderMapper.plan(Seq("name", "established", "bogus"), Fixtures.company)
    plan.mappings(0) shouldBe a[Direct]
    plan.mappings(1) shouldBe a[Direct]
    plan.mappings(2) shouldBe a[Invalid]
    plan.warnings should have size 1
  }

  test("relation.field dot notation maps to RelationSearch") {
    val plan = HeaderMapper.plan(Seq("name", "country.name", "country.code"), Fixtures.company)
    plan.mappings(1) should matchPattern {
      case RelationSearch("country.name", a, "name") if a.name == "country" =>
    }
    plan.mappings(2) should matchPattern {
      case RelationSearch("country.code", a, "code") if a.name == "country" =>
    }
  }

  test("component dot notation: componentField is everything after first segment") {
    // reference :244-253; three-segment grammar (component.relation.field)
    val plan = HeaderMapper.plan(
      Seq("fullName", "address.city", "address.country.name"), Fixtures.person)
    plan.mappings(1) should matchPattern {
      case ComponentPath("address.city", a, "city") if a.name == "address" =>
    }
    plan.mappings(2) should matchPattern {
      case ComponentPath("address.country.name", a, "country.name") if a.name == "address" =>
    }
  }

  test("bare component header is invalid") {
    val plan = HeaderMapper.plan(Seq("fullName", "address"), Fixtures.person)
    plan.mappings(1) shouldBe a[Invalid]
  }

  test("missing required non-defaulted attribute is a schema-level error") {
    val plan = HeaderMapper.plan(Seq("established"), Fixtures.company)
    plan.errors.exists(_.contains("\"name\"")) shouldBe true
    // `active` has a default so it is NOT required in headers
    plan.errors.exists(_.contains("active")) shouldBe false
  }

  test("relation-target uniqueness pre-check warns on non-unique search field") {
    val plan = HeaderMapper.plan(Seq("name", "country.name"), Fixtures.company)
    val (errs, warns) = HeaderMapper.validateRelationTargets(plan, Fixtures.registry)
    errs shouldBe empty
    warns.exists(_.contains("not unique")) shouldBe true // country.name is not unique
    val plan2 = HeaderMapper.plan(Seq("name", "country.code"), Fixtures.company)
    val (e2, w2) = HeaderMapper.validateRelationTargets(plan2, Fixtures.registry)
    e2 shouldBe empty
    w2 shouldBe empty // code IS unique
  }

  test("unknown search field on the relation target is an error") {
    val plan = HeaderMapper.plan(Seq("country.nope"), Fixtures.company)
    val (errs, _) = HeaderMapper.validateRelationTargets(plan, Fixtures.registry)
    errs.exists(_.contains("nope")) shouldBe true
  }
}
