package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Chunking / deterministic sampling / decontamination edge cases. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("chunkTokens: stride, overlap, short tail, empty doc") {
    val df = Seq((1L, "a b c d e"), (2L, ""), (3L, "x")).toDF("id", "text")
    val out = TextAnalysis.chunkTokens(df, "id", "text", chunkSize = 3, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .sortBy(t => (t._1, t._2))
    out shouldBe Seq(
      (1L, 0, "a b c", 3), // start 0
      (1L, 1, "c d e", 3), // start 2 — one token of lookback
      (1L, 2, "e", 1),     // start 4 — short tail
      (3L, 0, "x", 1))     // doc 2 (zero tokens) emits nothing
  }

  test("hashSample is deterministic and stratified variant samples per stratum") {
    val df = (1L to 400L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "src")
    val a = Sampling.hashSample(df, col("id"), "8").select("id").as[Long].collect().sorted
    val b = Sampling.hashSample(df, col("id"), "8").select("id").as[Long].collect().sorted
    a shouldBe b
    a.length should (be > 120 and be < 280) // ~50% of 400
    val strat = Sampling.stratifiedHashSample(df, col("src"), col("id"), "4")
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strat.keySet shouldBe Set("even", "odd") // both strata represented
    all(strat.values) should (be > 20L and be < 80L) // ~25% of 200 each
  }

  test("importance weights: target-like docs score above anti-target docs; resample is deterministic") {
    // target distribution = "apple banana" language; raw corpus mixes it
    // with "stock market" language. DSIR log-likelihood-ratio weights must
    // rank the target-like raw docs strictly above the others, and an
    // empty doc sits at exactly 0 (evidence for neither side).
    val raw = Seq(
      (1L, "apple banana apple banana apple"),
      (2L, "stock market stock market crash"),
      (3L, "apple banana fruit salad"),
      (4L, "market crash stock prices fall"),
      (5L, ""),
    ).toDF("doc_id", "text")
    val target = Seq((10L, "apple banana apple"), (11L, "banana apple fruit"))
      .toDF("doc_id", "text")
    val w = Sampling.importanceLogWeights(raw, "doc_id", "text", target, "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logw")).toMap
    w.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L) // one row per raw doc
    w(5L) shouldBe 0.0
    // RELATIVE order is the contract (DSIR selects by rank); absolute
    // signs are dominated by the α·D smoothing mass at toy corpus sizes
    w(1L) should be > w(2L)
    w(3L) should be > w(4L)
    w(1L) should be > w(4L)
    w(3L) should be > w(2L)
    // Gumbel top-k with md5 uniforms: deterministic across invocations,
    // k bounded, scores carried
    val s1 = Sampling.importanceResample(raw, "doc_id", "text", target, "text", k = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq.sorted
    val s2 = Sampling.importanceResample(raw, "doc_id", "text", target, "text", k = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq.sorted
    s1 shouldBe s2
    s1.length shouldBe 3
  }

  test("repetitionRatio: novel text 0, doubled text ~0.5, short docs 0") {
    val df = Seq(
      (1L, "one two three four five six"),            // all 3-grams novel
      (2L, "a b c d a b c d"),                        // doubled: 3/6 repeats
      (3L, "hi there"),                               // < 3 tokens
    ).toDF("id", "text")
    val out = df.select(col("id"),
        TextAnalysis.repetitionRatio(col("text"), 3).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out(1L) shouldBe 0.0
    // 6 total 3-grams, 4 distinct (abc, bcd, cda, dab): 1 - 4/6
    out(2L) shouldBe 0.3333
    out(3L) shouldBe 0.0
  }

  test("connectedComponents equals union-find on a random graph; isolated nodes self-label") {
    val rnd = new scala.util.Random(11)
    val n = 120
    val edges = Seq.fill(90)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // reference: plain union-find with min-root labels
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    val nodesDf = (0L until n.toLong).toDF("id")
    val edgesDf = edges.toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(nodesDf, "id", edgesDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe expected
    // the star-contraction form must produce the identical labeling
    val star = Dedup.starContractComponents(nodesDf, "id", edgesDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    star shouldBe expected
  }

  test("star contraction: path longer than maxIter converges via the fallback") {
    val n = 64L // path 0—1—…—63: diameter 63, far past maxIter 5
    val nodesDf = (0L until n).toDF("id")
    val edgesDf = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val viaFallback = Dedup.connectedComponents(nodesDf, "id", edgesDf, maxIter = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    viaFallback shouldBe (0L until n).map(_ -> 0L).toMap
    // strict mode still refuses instead of returning partial labels
    an[IllegalStateException] should be thrownBy
      Dedup.connectedComponents(nodesDf, "id", edgesDf, maxIter = 5, starFallback = false)
    // isolated nodes self-label through the fallback path too
    val nodes2 = ((0L until n) ++ Seq(200L)).toDF("id")
    val star = Dedup.starContractComponents(nodes2, "id", edgesDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    star(200L) shouldBe 200L
    star(63L) shouldBe 0L
  }

  test("packSequences: spanning docs, empty docs, exact boundary arithmetic") {
    val df = Seq((1L, "a b c"), (2L, "d e f g h"), (3L, ""), (4L, "i"))
      .toDF("doc_id", "text")
    val out = Packing.packSequences(df, "doc_id", "text", seqLen = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    // token stream: [a b c | d] [e f g h] [i] — doc 2 spans seqs 0 and 1,
    // doc 3 (zero tokens) vanishes but still occupies prefix-sum position
    out shouldBe Seq(
      (1L, 0L, 0L, 3L, 0L), // doc 1 fully in seq 0 at offset 0
      (2L, 0L, 0L, 1L, 3L), // doc 2 tokens [0,1) fill seq 0's tail
      (2L, 1L, 1L, 5L, 0L), // doc 2 tokens [1,5) open seq 1
      (4L, 2L, 0L, 1L, 0L)) // doc 4 opens seq 2
  }

  test("asofJoin: inclusive match, no-prior null, null key, absent key") {
    val events = Seq(
      (10L, 1L, 10L), (11L, 1L, 5L), (12L, 1L, 4L), (13L, 2L, 10L),
    ).toDF("eid", "k", "t")
      .unionByName(Seq((14L, Option.empty[Long], 10L)).toDF("eid", "k", "t"))
    val snaps = Seq((1L, 5L, "A"), (1L, 8L, "B"), (3L, 1L, "C")).toDF("k2", "t2", "v")
    val out = Joins.asofJoin(events, col("k"), col("t"), snaps, col("k2"), col("t2"), Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("v"))).toMap
    out shouldBe Map(
      10L -> Some("B"), // latest of A@5, B@8
      11L -> Some("A"), // equal ts matches (inclusive)
      12L -> None,      // before the first snapshot
      13L -> None,      // key absent from right
      14L -> None)      // null key never matches
  }

  test("asofJoin: reserved internal names rejected; tiebreak pins duplicate-(key,ts) winner") {
    val events = Seq((10L, 1L, 10L)).toDF("eid", "k", "t")
    val badLeft = Seq((10L, 1L, 10L)).toDF("__side", "k", "t")
    val snaps = Seq((1L, 5L, "A")).toDF("k2", "t2", "v")
    an[IllegalArgumentException] should be thrownBy
      Joins.asofJoin(badLeft, col("k"), col("t"), snaps, col("k2"), col("t2"), Seq("v"))
    an[IllegalArgumentException] should be thrownBy
      Joins.asofJoin(events, col("k"), col("t"),
        snaps.withColumnRenamed("v", "__tb0"), col("k2"), col("t2"), Seq("__tb0"))
    // duplicate (key, ts) right rows: the greatest tiebreak value wins
    val dup = Seq((1L, 5L, 1L, "old"), (1L, 5L, 2L, "new"), (1L, 5L, 0L, "older"))
      .toDF("k2", "t2", "ver", "v")
    val out = Joins.asofJoin(events, col("k"), col("t"), dup, col("k2"), col("t2"),
        Seq("v"), rightTiebreak = Seq(col("ver")))
      .collect().map(_.getAs[String]("v"))
    out shouldBe Array("new")
  }

  test("temperatureMix: rare strata boost toward uniform, total tracks the target") {
    // 1000 rows, 10:1 skew: natural shares 10/11 vs 1/11; alpha 0.5
    // shifts toward sqrt shares ~0.76/0.24
    val df = ((1 to 1000).map(i => (i.toLong, if (i <= 909) "big" else "small")))
      .toDF("id", "src")
    val kept = Sampling.temperatureMix(df, col("src"), col("id"),
        alpha = 0.5, targetFraction = 0.5)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    val total = kept.values.sum
    // md5 thresholds are binomial around the expectation: wide bands
    total.toDouble shouldBe (500.0 +- 80.0)
    // the small stratum's KEPT share must exceed its natural 1/11 share
    kept("small").toDouble / total should be > 0.15
    // alpha = 1 reproduces plain proportional sampling rates
    val prop = Sampling.temperatureMix(df, col("src"), col("id"),
        alpha = 1.0, targetFraction = 0.5)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    prop("big").toDouble / prop.values.sum shouldBe (909.0 / 1000.0 +- 0.08)
    // determinism: identical call, identical row set
    val again = Sampling.temperatureMix(df, col("src"), col("id"),
        alpha = 0.5, targetFraction = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    Sampling.temperatureMix(df, col("src"), col("id"),
        alpha = 0.5, targetFraction = 0.5)
      .select("id").as[Long].collect().sorted.toSeq shouldBe again
    // null strata drop (weightedMix semantics) instead of NPE-ing the
    // driver-side rate computation
    val withNull = df.unionByName(
      Seq((9999L, Option.empty[String])).toDF("id", "src"))
    val nn = Sampling.temperatureMix(withNull, col("src"), col("id"),
      alpha = 0.5, targetFraction = 0.5)
    nn.filter(col("src").isNull).count() shouldBe 0L
  }

  test("epochUpsample: exact full copies, deterministic fraction, dropped strata, distinct order keys") {
    val df = ((1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 150).map(i => (i.toLong, "b")) ++
      (151 to 160).map(i => (i.toLong, "c"))).toDF("id", "src")
    val out = Sampling.epochUpsample(df, col("src"), col("id"),
      Map("a" -> 2.0, "b" -> 0.5))
    val rows = out.collect()
    // 'a' at 2.0 epochs: exactly two full copies, epochs {0, 1} complete
    rows.count(_.getAs[String]("src") == "a") shouldBe 200
    out.filter(col("src") === "a").groupBy("epoch").count()
      .collect().map(r => r.getAs[Int]("epoch") -> r.getAs[Long]("count"))
      .toMap shouldBe Map(0 -> 100L, 1 -> 100L)
    // 'b' at 0.5: zero full copies, an md5-threshold fraction of epoch 0 —
    // nonempty, not everything, and bit-reproducible
    val b1 = rows.filter(_.getAs[String]("src") == "b").map(_.getAs[Long]("id")).toSet
    b1.size should (be > 0 and be < 50)
    val b2 = Sampling.epochUpsample(df, col("src"), col("id"), Map("b" -> 0.5))
      .collect().map(_.getAs[Long]("id")).toSet
    b2 shouldBe b1
    // strata absent from the map drop entirely
    rows.count(_.getAs[String]("src") == "c") shouldBe 0
    // the shuffle key is unique across copies (content + epoch keyed)
    rows.map(_.getAs[String]("order_key")).distinct.length shouldBe rows.length
  }

  test("rangeJoin: inclusive bounds, bucket-crossing intervals, drops and caps") {
    // buckets of width 10: interval [5, 25] crosses three buckets; every
    // containment must surface exactly ONCE (no per-bucket duplicates)
    val intervals = Seq((1L, 5L, 25L), (2L, 30L, 30L), (3L, 40L, 35L))
      .toDF("iid", "s", "e") // iid 3 is inverted: drops
      .unionByName(Seq((4L, Option.empty[Long], Option(50L))).toDF("iid", "s", "e"))
    val points = Seq((100L, 5L), (101L, 25L), (102L, 26L), (103L, 30L), (104L, 15L))
      .toDF("pid", "t")
      .unionByName(Seq((105L, Option.empty[Long])).toDF("pid", "t"))
    val out = Joins.rangeJoin(intervals, col("s"), col("e"), points, col("t"),
        bucketWidth = 10L)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    out shouldBe Set(
      (1L, 100L), // start-inclusive
      (1L, 101L), // end-inclusive, two buckets from the start
      (1L, 104L), // mid-bucket
      (2L, 103L)) // single-point interval
    // extra equi-key separates tenants sharing time ranges
    val li = Seq((1L, 0L, 100L, "a"), (2L, 0L, 100L, "b")).toDF("iid", "s", "e", "ik")
    val pi = Seq((100L, 50L, "a"), (101L, 50L, "c")).toDF("pid", "t", "pk")
    val keyed = Joins.rangeJoin(li, col("s"), col("e"), pi, col("t"), 10L,
        leftExtraKey = Some(col("ik")), rightExtraKey = Some(col("pk")))
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    keyed shouldBe Set((1L, 100L))
    // the bucket-span cap drops runaway intervals instead of exploding
    val wide = Seq((9L, 0L, 1000000L)).toDF("iid", "s", "e")
    Joins.rangeJoin(wide, col("s"), col("e"), points, col("t"), 10L,
      maxBucketsPerInterval = 100).collect() shouldBe empty
    // colliding column names rejected
    an[IllegalArgumentException] should be thrownBy
      Joins.rangeJoin(intervals, col("s"), col("e"),
        points.withColumnRenamed("pid", "iid"), col("t"), 10L)
  }

  test("overlapJoin: closed endpoints, one row per pair across shared buckets, drops and keys") {
    // width 10: [5, 25] and [20, 45] share buckets 2..2? — they share
    // [20,25] spanning buckets 2; [5,25] covers 0..2, [20,45] covers
    // 2..4 — a pair emitted once despite the bucket machinery
    val a = Seq((1L, 5L, 25L), (2L, 100L, 110L), (3L, 60L, 50L))
      .toDF("aid", "as_", "ae") // aid 3 inverted: drops
    val b = Seq(
      (10L, 20L, 45L),  // overlaps aid 1 on [20, 25]
      (11L, 25L, 30L),  // touches aid 1 at the closed endpoint 25
      (12L, 26L, 40L),  // just past aid 1's end: no match
      (13L, 0L, 200L))  // spans everything: overlaps 1 and 2
      .toDF("bid", "bs", "be")
    val out = Joins.overlapJoin(a, col("as_"), col("ae"), b, col("bs"), col("be"),
        bucketWidth = 10L)
      .select("aid", "bid").as[(Long, Long)].collect().toList
    // LIST, not set: structural dedup must yield exactly one row per pair
    out.sorted shouldBe List((1L, 10L), (1L, 11L), (1L, 13L), (2L, 13L))
    // extra equi-key separates tenants
    val ka = Seq((1L, 0L, 100L, "t1")).toDF("aid", "as_", "ae", "ak")
    val kb = Seq((10L, 50L, 60L, "t1"), (11L, 50L, 60L, "t2")).toDF("bid", "bs", "be", "bk")
    Joins.overlapJoin(ka, col("as_"), col("ae"), kb, col("bs"), col("be"), 10L,
        leftExtraKey = Some(col("ak")), rightExtraKey = Some(col("bk")))
      .select("aid", "bid").as[(Long, Long)].collect().toSet shouldBe Set((1L, 10L))
    // colliding column names rejected
    an[IllegalArgumentException] should be thrownBy
      Joins.overlapJoin(a, col("as_"), col("ae"),
        b.withColumnRenamed("bid", "aid"), col("bs"), col("be"), 10L)
  }

  test("rangeJoin narrowPayload: identical results, duplicates and wide payload intact") {
    // wide-ish payload + a DUPLICATE interval row: the rowid re-attach
    // must return each duplicate its own payload copy, exactly like the
    // payload-replicating default
    val intervals = Seq(
      (1L, 5L, 25L, "payload-one"), (2L, 30L, 30L, "payload-two"),
      (1L, 5L, 25L, "payload-one"), // exact duplicate row
    ).toDF("iid", "s", "e", "blob")
    val points = Seq((100L, 5L), (101L, 25L), (102L, 26L), (103L, 30L), (104L, 15L))
      .toDF("pid", "t")
    def run(narrow: Boolean) =
      Joins.rangeJoin(intervals, col("s"), col("e"), points, col("t"),
          bucketWidth = 10L, narrowPayload = narrow)
        .select("iid", "blob", "pid").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(x => (x._1, x._3)).toSeq
    val narrow = run(true)
    narrow shouldBe run(false)
    // the duplicate interval matched twice per contained point
    narrow.count(_ == ((1L, "payload-one", 104L))) shouldBe 2
    // extra equi-key works through the narrow path too
    val li = Seq((1L, 0L, 100L, "a"), (2L, 0L, 100L, "b")).toDF("iid", "s", "e", "ik")
    val pi = Seq((100L, 50L, "a"), (101L, 50L, "c")).toDF("pid", "t", "pk")
    Joins.rangeJoin(li, col("s"), col("e"), pi, col("t"), 10L,
        leftExtraKey = Some(col("ik")), rightExtraKey = Some(col("pk")),
        narrowPayload = true)
      .select("iid", "pid").as[(Long, Long)].collect().toSet shouldBe Set((1L, 100L))
  }

  test("rangeJoin plans as an equi-join: no nested-loop, no cartesian") {
    val intervals = (1 to 50).map(i => (i.toLong, i * 10L, i * 10L + 15L)).toDF("iid", "s", "e")
    val points = (1 to 300).map(i => (1000L + i, i * 2L)).toDF("pid", "t")
    val out = Joins.rangeJoin(intervals, col("s"), col("e"), points, col("t"), 10L)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    (plan should not).include("BroadcastNestedLoopJoin")
    (plan should not).include("CartesianProduct")
  }

  test("globalPrefixSum: null and all-null values contribute 0, no driver NPE") {
    val df = Seq[(Long, Option[Long])](
      (1L, None), (2L, Some(3L)), (3L, None), (4L, Some(2L)), (5L, None))
      .toDF("id", "v")
    val got = graft.operators.Ids.globalPrefixSum(df, Seq(col("id")), col("v"), "ps")
      .select("id", "ps").as[(Long, Long)].collect().toMap
    got shouldBe Map(1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 3L, 5L -> 5L)
    // every value null (every range partition sums to NULL pre-coalesce)
    val allNull = Seq[(Long, Option[Long])]((1L, None), (2L, None)).toDF("id", "v")
    val zeros = graft.operators.Ids.globalPrefixSum(allNull, Seq(col("id")), col("v"), "ps")
      .select("ps").as[Long].collect().toSeq
    zeros shouldBe Seq(0L, 0L)
  }

  test("asofJoin tolerance: stale matches null out, fresh ones survive") {
    val events = Seq((10L, 1L, 10L), (11L, 1L, 6L)).toDF("eid", "k", "t")
    val snaps = Seq((1L, 5L, "A"), (1L, 8L, "B")).toDF("k2", "t2", "v")
    def run(tol: Long) =
      Joins.asofJoin(events, col("k"), col("t"), snaps, col("k2"), col("t2"),
          Seq("v"), tolerance = Some(lit(tol)))
        .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("v"))).toMap
    // tol 2: event@10 matched B@8 (10-8 ≤ 2 fresh); event@6 matched A@5 fresh
    run(2L) shouldBe Map(10L -> Some("B"), 11L -> Some("A"))
    // tol 1: B@8 is 2 stale for event@10 → null; A@5 still fresh for event@6
    run(1L) shouldBe Map(10L -> None, 11L -> Some("A"))
  }

  test("weightedMix: full rate keeps stratum, zero rate and absent strata drop") {
    val df = (1L to 300L).map(i => (i, s"src${i % 3}")).toDF("id", "src")
    val kept = Sampling.weightedMix(df, col("src"), col("id"),
        Map("src0" -> 1.0, "src1" -> 0.0))
      .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    kept shouldBe Map("src0" -> 100L) // src1 rate 0, src2 unlisted
    // a fractional rate is deterministic and roughly proportional
    val half = Sampling.weightedMix(df, col("src"), col("id"), Map("src2" -> 0.5))
      .count()
    val half2 = Sampling.weightedMix(df, col("src"), col("id"), Map("src2" -> 0.5))
      .count()
    half shouldBe half2
    half.toInt should (be > 25 and be < 75)
  }

  test("weightedMix at high stratum cardinality: 20k-entry weights decide per stratum") {
    // one row per stratum at rate 1.0 on evens / 0.0 on odds: the kept set
    // is exactly the evens — a when-chain spelling could not even PLAN a
    // 20k-branch threshold (Catalyst tree recursion); 20k > 64 strata, so
    // this exercises the broadcast-join route
    val df = (0L until 20000L).map(i => (i, s"d$i")).toDF("id", "dom")
    val weights = (0 until 20000).map(i =>
      s"d$i" -> (if (i % 2 == 0) 1.0 else 0.0)).toMap
    val kept = Sampling.weightedMix(df, col("dom"), col("id"), weights)
      .select("id").as[Long].collect().sorted
    kept shouldBe (0L until 20000L by 2).toArray
    // null strata drop rather than NPE/throw (try_element_at path)
    val withNull = Seq((1L, "d0"), (2L, null)).toDF("id", "dom")
    Sampling.weightedMix(withNull, col("dom"), col("id"), Map("d0" -> 1.0))
      .select("id").as[Long].collect().toSeq shouldBe Seq(1L)
  }

  test("globalPrefixSum matches a single-partition window cumsum") {
    val df = (1L to 500L).map(i => (i, i % 7)).toDF("id", "v")
    val got = graft.operators.Ids.globalPrefixSum(df, Seq(col("id")), col("v"), "ps")
      .select("id", "ps").as[(Long, Long)].collect().toMap
    var acc = 0L
    val expected = (1L to 500L).map { i => val e = i -> acc; acc += i % 7; e }.toMap
    got shouldBe expected
  }

  test("decontaminate drops n-gram overlap with the eval set, keeps short docs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),   // shares "quick brown fox" with eval
      (2L, "completely unrelated text here"),
      (3L, "too short"),                   // < n tokens: no shingles, kept
    ).toDF("doc_id", "text")
    val eval = Seq("benchmark says quick brown fox etc").toDF("text")
    val kept = CorpusClean.decontaminate(corpus, "doc_id", "text", eval, "text", n = 3)
      .select("doc_id").as[Long].collect().sorted
    kept shouldBe Seq(2L, 3L)
  }

  test("bloomSemiJoin: zero false negatives, real pruning, guards") {
    import org.apache.spark.sql.functions.col
    val fact = (1L to 2000L).map(i => (i, i % 997)).toDF("fk", "payload")
    val dim = (1L to 2000L).filter(_ % 50 == 0).map(i => (i, s"d$i"))
      .toDF("dk", "name") // 40 of 2000 keys
    val filtered = Joins.bloomSemiJoin(fact, col("fk"), dim, col("dk"))
      .select("fk").as[Long].collect().toSet
    // every true match survives — the exactness the gate's oracle pins
    (1L to 2000L).filter(_ % 50 == 0).foreach(k => filtered should contain(k))
    // ...and the filter actually prunes: with m = 16384, k = 3, n = 40
    // the FP rate is ~4e-7 — anything near the full fact table means the
    // bit tests are broken
    filtered.size should be < 100
    an[IllegalArgumentException] should be thrownBy
      Joins.bloomSemiJoin(fact, col("fk"), dim, col("dk"), mBits = 100)
    an[IllegalArgumentException] should be thrownBy
      Joins.bloomSemiJoin(fact, col("fk"), dim, col("dk"), k = 0)
  }
}
