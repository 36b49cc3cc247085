package graft.ext

import graft.SparkSpec

/** Bradley-Terry preference ranking: the MM iteration on the integer
  * grid must recover dominance orders, treat symmetric records as equal
  * strength, and aggregate the win matrix exactly.
  */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("win matrix aggregates ordered pairs exactly") {
    val pairs = Seq(("a", "b"), ("a", "b"), ("b", "a"), ("a", "c"))
      .toDF("winner", "loser")
    val m = Preference.winMatrix(pairs, "winner", "loser").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_games"), r.getAs[Long]("n_wins_vs_opp"))).toMap
    m(("a", "b")) shouldBe ((3L, 2L))
    m(("b", "a")) shouldBe ((3L, 1L))
    m(("a", "c")) shouldBe ((1L, 1L))
    m(("c", "a")) shouldBe ((1L, 0L))
  }

  test("transitive dominance orders the strengths") {
    // a beats b 9:1, b beats c 9:1, a beats c 9:1
    val pairs = (
      Seq.fill(9)(("a", "b")) ++ Seq.fill(1)(("b", "a")) ++
      Seq.fill(9)(("b", "c")) ++ Seq.fill(1)(("c", "b")) ++
      Seq.fill(9)(("a", "c")) ++ Seq.fill(1)(("c", "a"))
    ).toDF("winner", "loser")
    val out = Preference.bradleyTerry(pairs, "winner", "loser")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("w_q"), r.getAs[Int]("rk"))).toMap
    out("a")._1 should be > out("b")._1
    out("b")._1 should be > out("c")._1
    out("a")._2 shouldBe 1
    out("c")._2 shouldBe 3
  }

  test("symmetric records give equal strengths; grid mass conserved") {
    val pairs = (Seq.fill(5)(("a", "b")) ++ Seq.fill(5)(("b", "a")) ++
      Seq.fill(5)(("a", "c")) ++ Seq.fill(5)(("c", "a")) ++
      Seq.fill(5)(("b", "c")) ++ Seq.fill(5)(("c", "b")))
      .toDF("winner", "loser")
    val rows = Preference.bradleyTerry(pairs, "winner", "loser").collect()
    val ws = rows.map(_.getAs[Long]("w_q")).distinct
    ws.length shouldBe 1 // identical records, identical strengths
    val total = rows.map(_.getAs[Long]("w_q")).sum
    // floors can shave at most |items| grid units
    total should be <= 1000000L
    total should be >= (1000000L - rows.length)
    // n_wins/n_games exact
    rows.foreach { r =>
      r.getAs[Long]("n_games") shouldBe 20L
      r.getAs[Long]("n_wins") shouldBe 10L
    }
  }

  test("a never-winning item ranks last with zero strength share") {
    val pairs = (Seq.fill(4)(("a", "z")) ++ Seq.fill(4)(("b", "z")) ++
      Seq.fill(2)(("a", "b")) ++ Seq.fill(2)(("b", "a")))
      .toDF("winner", "loser")
    val out = Preference.bradleyTerry(pairs, "winner", "loser")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("w_q"), r.getAs[Int]("rk"))).toMap
    out("z")._1 shouldBe 0L
    out("z")._2 shouldBe 3
  }
}
