package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Analytics additions: table profiling, exact heavy hitters, sliding
  * windows.
  */
class ProfileStatsSpec extends SparkSpec {
  import spark.implicits._

  test("numericProfile counts rows, nulls, distincts and 4dp ranges per column") {
    val df = Seq((1.0, Some(2.0)), (2.0, None), (2.0, Some(8.0)))
      .toDF("a", "b")
    val out = Profile.numericProfile(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    out("a") shouldBe ((3L, 0L, 2L, 1.0, 2.0, math.rint(5.0 / 3 * 10000) / 10000))
    out("b") shouldBe ((3L, 1L, 2L, 2.0, 8.0, 5.0))
  }

  test("topKPerGroup ranks by count desc then value asc, exactly k rows per group") {
    val df = Seq(
      (1L, "x"), (1L, "x"), (1L, "y"), (1L, "y"), (1L, "z"),
      (2L, "w")).toDF("g", "v")
    val out = Stats.topKPerGroup(df, "g", "v", 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // group 1: x and y tie at 2 -> x first (value asc); z cut by k=2
    out shouldBe Array((1L, 1, "x", 2L), (1L, 2, "y", 2L), (2L, 1, "w", 1L))
  }

  test("count-min sketch never undercounts; counters stay sketch-sized under collisions") {
    val vals = (1 to 200).flatMap(i => Seq.fill(i % 7 + 1)(s"tok$i"))
    val df = vals.toDF("v")
    val counters = Sketch.cmsCounters(df, col("v"), depth = 3, width = 8)
    counters.count() should be <= (3L * 8)
    val est = Sketch.cmsEstimate(counters, df.distinct(), "v", depth = 3, width = 8)
    val tru = df.groupBy(col("v")).agg(count(lit(1)).as("t"))
    val joined = est.join(tru, Seq("v")).collect()
    joined should have size 200
    // the CM guarantee: est >= true for every value, always
    all(joined.map(r => r.getAs[Long]("est_n") - r.getAs[Long]("t"))) should be >= 0L
    // 200 values into 8 buckets: collisions guaranteed, so SOME overcount
    joined.map(r => r.getAs[Long]("est_n") - r.getAs[Long]("t")).max should be > 0L
  }

  test("equiDepthBins: SQL-standard ntile sizes, deterministic bounds, null exclusion") {
    val df = (1 to 10).map(i => (i.toDouble, i.toLong)).toDF("v", "k")
      .unionByName(Seq((Option.empty[Double], 99L)).toDF("v", "k"))
    val out = Stats.equiDepthBins(df, "v", "k", bins = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    // n=10, bins=4 -> sizes 3,3,2,2
    out shouldBe Array((1, 3L, 1.0, 3.0), (2, 3L, 4.0, 6.0),
      (3, 2L, 7.0, 8.0), (4, 2L, 9.0, 10.0))
  }

  test("pageRank: a cycle stays uniform; a star concentrates on the hub") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val cr = Graph.pageRank(cycle, "s", "d", iters = 5)
      .collect().map(_.getDouble(1))
    all(cr) shouldBe (1.0 / 3) +- 1e-12
    // star 1→2, 3→2: after one iteration r(2) = 0.15/3 + 0.85·(2/3)
    val star = Seq((1L, 2L), (3L, 2L)).toDF("s", "d")
    val sr = Graph.pageRank(star, "s", "d", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    sr(2L) shouldBe (0.15 / 3 + 0.85 * (2.0 / 3)) +- 1e-12
    sr(1L) shouldBe (0.15 / 3) +- 1e-12
    sr(3L) shouldBe (0.15 / 3) +- 1e-12
  }

  test("slidingWindowAgg: each event lands in length/slide overlapping windows") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 05:30:00")
    val df = Seq((ts, "click", 1.0)).toDF("ts", "event_type", "value")
    val out = graft.streaming.EventStreams.slidingWindowAgg(df, "2 hours", "1 hour")
      .collect().map(r => r.getTimestamp(0).toString).sorted
    out shouldBe Array("2024-01-01 04:00:00.0", "2024-01-01 05:00:00.0")
  }

  test("labelPropagation: two cliques joined by one bridge split into two communities") {
    // cliques {1,2,3} and {10,11,12}, bridge 3-10
    val cliques = for {
      g <- Seq(Seq(1L, 2L, 3L), Seq(10L, 11L, 12L))
      a <- g; b <- g if a < b
    } yield (a, b)
    val e = (cliques :+ ((3L, 10L))).toDF("s", "d")
    val got = Graph.labelPropagation(e, "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each clique converges onto its own minimum label; the bridge ends
    // with its clique (two same-clique neighbors outvote the one bridge)
    Seq(1L, 2L, 3L).map(got).toSet.size shouldBe 1
    Seq(10L, 11L, 12L).map(got).toSet.size shouldBe 1
    got(1L) should not be got(11L)
    // directions don't matter: reversed edges give the identical result
    val rev = Graph.labelPropagation(e.select($"d".as("s"), $"s".as("d")),
        "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rev shouldBe got
  }

  test("labelPropagation: mode tie adopts the SMALLEST community label") {
    // r21 internals change: the per-round row_number window over
    // (count desc, community asc) became min(struct(-count, community)).
    // Pin the tie-break itself: node 5's neighbors {1, 2} tie 1:1 after
    // init (labels = self), so one round must adopt community 1, not 2 —
    // and the aggregate must agree with an explicit window replay.
    val e = Seq((5L, 1L), (5L, 2L), (1L, 1L), (2L, 2L)).toDF("s", "d")
    val got = Graph.labelPropagation(e, "s", "d", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got(5L) shouldBe 1L
    // non-tied counts still win over a smaller label: add a second
    // neighbor in community 2 and the mode flips despite 1 < 2
    val e2 = Seq((5L, 1L), (5L, 2L), (5L, 3L), (2L, 2L), (3L, 2L), (1L, 1L))
      .toDF("s", "d")
    // after init, 5's neighbor labels are {1:1, 2:1, 3:1} — still a tie
    // broken to 1 — but 2 rounds in, 3 has adopted 2 and the mode is 2
    val got2 = Graph.labelPropagation(e2, "s", "d", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got2(5L) shouldBe 2L
  }
}
