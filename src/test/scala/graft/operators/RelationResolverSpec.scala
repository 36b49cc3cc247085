package graft.operators

import graft.{Fixtures, SparkSpec}

/** Relation-resolution semantics (reference: tests/services/csv-import.test.js:194-230,
  * :297-365; integration tests full-workflow.test.js:104-184).
  */
class RelationResolverSpec extends SparkSpec {
  import spark.implicits._

  private def countries = Fixtures.countryDf(spark)

  test("J1: explicit field eqi match, case-insensitive; miss resolves null") {
    val incoming = Seq(
      ("Project Alpha", "united states"),
      ("Project Beta", "INDIA"),
      ("Project Gamma", "China"),
      ("Project Delta", "Brazil"),
    ).toDF("name", "country")
    val res = RelationResolver.resolveByField(incoming, "country", countries, "id", "name", "cid")
      .orderBy("name").collect()
    // alphabetical: Alpha→US, Beta→India, Delta→miss, Gamma→China
    res.map(r => Option(r.getAs[Any]("cid"))).toSeq shouldBe
      Seq(Some(2L), Some(1L), None, Some(3L))
  }

  test("J1: contains fallback fires on equality miss") {
    val incoming = Seq(("p1", "nited Stat"), ("p2", "dia")).toDF("name", "country")
    val res = RelationResolver.resolveByField(incoming, "country", countries, "id", "name", "cid")
      .orderBy("name").collect()
    res.map(_.getAs[Long]("cid")).toSeq shouldBe Seq(2L, 1L)
  }

  test("J2: numeric bare value resolves by id; name bare value via cascade") {
    val incoming = Seq(("a", "2"), ("b", "china"), ("c", "99"), ("d", "")).toDF("k", "v")
    val res = RelationResolver.resolveBare(incoming, "v", countries, "id", "cid")
      .orderBy("k").collect()
    res.map(r => Option(r.getAs[Any]("cid"))).toSeq shouldBe
      Seq(Some(2L), Some(3L), None, None)
  }

  test("J2: cascade priority — name wins over later common fields") {
    val target = Seq(
      (1L, "alpha", "beta"), // name=alpha, title=beta
      (2L, "beta", "alpha"),
    ).toDF("id", "name", "title")
    val incoming = Seq(("x", "beta")).toDF("k", "v")
    // name (prio 1) match on id=2 must beat title (prio 2) match on id=1
    val res = RelationResolver.resolveBare(incoming, "v", target, "id", "cid",
      enableContains = false).collect()
    res.head.getAs[Long]("cid") shouldBe 2L
  }

  test("J3: multi relation comma-split resolves ordered id array; misses dropped") {
    val incoming = Seq(
      ("r1", "India, China"),
      ("r2", "China,Brazil,United States"),
      ("r3", "Atlantis"),
    ).toDF("k", "v")
    val res = RelationResolver.resolveMultiByField(incoming, "v", countries, "id", "name", "cids")
      .orderBy("k").collect()
    res(0).getAs[Seq[Long]]("cids") shouldBe Seq(1L, 3L)
    res(1).getAs[Seq[Long]]("cids") shouldBe Seq(3L, 2L)
    Option(res(2).getAs[Any]("cids")) shouldBe None // all-miss ⇒ dropped (null)
  }

  test("multi bare: comma list resolved per-element through the cascade") {
    val incoming = Seq(
      ("r1", "2, china"),        // id + name mix
      ("r2", "india,99,China"),  // name, dead id, name
      ("r3", "nothing-here"),
    ).toDF("k", "v")
    val res = RelationResolver.resolveMultiBare(incoming, "v", countries, "id", "cids",
      enableContains = false).orderBy("k").collect()
    res(0).getSeq[Long](res(0).fieldIndex("cids")) shouldBe Seq(2L, 3L)
    res(1).getSeq[Long](res(1).fieldIndex("cids")) shouldBe Seq(1L, 3L)
    Option(res(2).getAs[Any]("cids")) shouldBe None
  }

  test("deterministic tie-break: lowest id wins on duplicate values") {
    val target = Seq((5L, "dup"), (2L, "dup"), (9L, "dup")).toDF("id", "name")
    val incoming = Seq(("x", "dup")).toDF("k", "v")
    val res = RelationResolver.resolveByField(incoming, "v", target, "id", "name", "cid").collect()
    res.head.getAs[Long]("cid") shouldBe 2L
  }
}
