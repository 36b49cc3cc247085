package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PAV's contract: exact-integer pooling, non-decreasing fit, block
  * granularity preserved, and the distributed entry point reducing to
  * the same sweep.
  */
class CalibrateSpec extends SparkSpec {
  import spark.implicits._

  private def fits(blocks: Seq[(Long, Long, Long)]) =
    Calibrate.pav(blocks).map(r => (r._1, r._6))

  test("a monotone input is returned unpooled") {
    val blocks = Seq((1L, 4L, 0L), (2L, 4L, 1L), (3L, 4L, 2L), (4L, 4L, 4L))
    Calibrate.pav(blocks).map(r => (r._4, r._5)) shouldBe
      Seq((0L, 4L), (1L, 4L), (2L, 4L), (4L, 4L))
  }

  test("a single violation pools exactly the violating pair") {
    // rates .25, 1, .4, 1, .167, 1 → the middle four pool to 8/16
    val blocks = Seq((1L, 4L, 1L), (2L, 3L, 3L), (3L, 5L, 2L),
      (4L, 2L, 2L), (5L, 6L, 1L), (6L, 4L, 4L))
    fits(blocks) shouldBe Seq((1L, 250000L), (2L, 500000L), (3L, 500000L),
      (4L, 500000L), (5L, 500000L), (6L, 1000000L))
  }

  test("merges cascade through earlier runs") {
    // rates 0.9, 0.8, 0.1: the last block first pools with the middle,
    // then the pooled run still violates the first — one final pool
    val blocks = Seq((1L, 10L, 9L), (2L, 10L, 8L), (3L, 10L, 1L))
    val out = Calibrate.pav(blocks)
    out.map(_._6).distinct shouldBe Seq(600000L) // 18/30 everywhere
    out.map(r => (r._4, r._5)).distinct shouldBe Seq((18L, 30L))
  }

  test("equal adjacent means are not a violation (granularity kept)") {
    val blocks = Seq((1L, 2L, 1L), (2L, 4L, 2L), (3L, 2L, 2L))
    Calibrate.pav(blocks).map(r => (r._4, r._5)) shouldBe
      Seq((1L, 2L), (2L, 4L), (2L, 2L))
  }

  test("fit is non-decreasing on an adversarial zigzag") {
    val blocks = (0 until 50).map(i =>
      (i.toLong, 3L + i % 4, ((i * 13) % 4).toLong))
    val out = Calibrate.pav(blocks)
    out.map(_._6).sliding(2).foreach {
      case Seq(a, b) => a should be <= b
      case _ =>
    }
    // pooled mass is conserved run by run: each block's rational is its
    // run's, and total pos/n match the input
    out.map(_._3).sum shouldBe blocks.map(_._3).sum
    out.map(_._2).sum shouldBe blocks.map(_._2).sum
  }

  test("isotonicApply serves the step function with clamps") {
    val fit = Seq((10L, 2L, 1L, 1L, 2L, 500000L), (20L, 2L, 2L, 2L, 2L, 1000000L))
      .toDF("score_q", "n", "n_pos", "fit_pos", "fit_n", "fit_q")
    val scored = Seq((1L, Some(5L)), (2L, Some(10L)), (3L, Some(15L)),
      (4L, Some(20L)), (5L, Some(99L)), (6L, None))
      .toDF("id", "s")
    val out = Calibrate.isotonicApply(fit, scored, col("s"))
      .select(col("id"), col("cal_q"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    out(1L) shouldBe Some(500000L) // below domain: clamp to first block
    out(2L) shouldBe Some(500000L) // on the first step
    out(3L) shouldBe Some(500000L) // inside [10, 20)
    out(4L) shouldBe Some(1000000L) // on the second step
    out(5L) shouldBe Some(1000000L) // above domain: last plateau
    out(6L) shouldBe None // null score calibrates to null
  }

  test("merge decisions survive corpus-scale counters (Long would wrap)") {
    // pooled products ~1.4e19 exceed Long.MaxValue: a cross-multiplied
    // Long compare wraps negative and silently skips the pool; the
    // BigInt compare must still see rate .9 > .8 and merge
    val blocks = Seq((1L, 4000000000L, 3600000000L),
      (2L, 4000000000L, 3200000000L))
    Calibrate.pav(blocks).map(r => (r._4, r._5)).distinct shouldBe
      Seq((6800000000L, 8000000000L))
  }

  /** Brute-force minimax isotonic fit (Robertson & Wright):
    * fit(i) = min over k ≥ i of max over j ≤ i of mean(blocks j..k),
    * compared as exact rationals. O(n³) — the ground truth the sweep
    * and the oracle's chain-pooling machine are both checked against.
    */
  private def bruteMinimax(blocks: Seq[(Long, Long, Long)])
      : Seq[(BigInt, BigInt)] = {
    val n = blocks.size
    def mean(j: Int, k: Int): (BigInt, BigInt) =
      (BigInt(blocks.slice(j, k + 1).map(_._3).sum),
        BigInt(blocks.slice(j, k + 1).map(_._2).sum))
    def lt(a: (BigInt, BigInt), b: (BigInt, BigInt)) = a._1 * b._2 < b._1 * a._2
    (0 until n).map { i =>
      (i until n).map { k =>
        (0 to i).map(j => mean(j, k)).reduce((a, b) => if (lt(a, b)) b else a)
      }.reduce((a, b) => if (lt(a, b)) a else b)
    }
  }

  /** A Scala replica of the ORACLE's chain-pooling machine (the
    * x_calibrate_* recursive CTE): each round pools every maximal
    * strictly-descending violating chain at once, to fixpoint. Pinned
    * here against the sequential sweep so the SQL's algorithm can never
    * drift from the engine's.
    */
  private def chainPool(blocks: Seq[(Long, Long, Long)]): Seq[(Long, Long)] = {
    var runs = blocks.map(b => (b._2, b._3)) // (n, pos) per run
    var looping = true
    while (looping) {
      val viol = runs.sliding(2).map {
        case Seq((ln, lp), (rn, rp)) => BigInt(lp) * rn > BigInt(rp) * ln
        case _ => false
      }.toVector
      if (!viol.contains(true)) looping = false
      else {
        val grp = runs.indices.map(i =>
          (0 until i).count(b => !viol(b))) // prefix count of non-viol edges
        runs = runs.zip(grp).groupBy(_._2).toSeq.sortBy(_._1).map { case (_, g) =>
          (g.map(_._1._1).sum, g.map(_._1._2).sum)
        }
      }
    }
    runs
  }

  test("sweep == chain-pooling machine == brute minimax on random blocks") {
    val rnd = new scala.util.Random(1906)
    (0 until 40).foreach { _ =>
      val blocks = (0 until (1 + rnd.nextInt(60))).map(i =>
        (i.toLong, 1L + rnd.nextInt(9), rnd.nextInt(10).toLong))
        .map(b => (b._1, b._2, math.min(b._3, b._2)))
      val swept = Calibrate.pav(blocks)
      val pooled = chainPool(blocks)
      // re-expand chain-pooled runs to block granularity by walking
      // block ns, then compare block-level fitted rationals
      var bi = 0
      val chainFit = pooled.flatMap { case (n, p) =>
        var left = n
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        while (left > 0) { out += ((p, n)); left -= blocks(bi)._2; bi += 1 }
        out
      }
      swept.map(r => (r._4, r._5)) shouldBe chainFit.map(f => (f._1, f._2))
      // and both equal the brute minimax VALUE as exact rationals
      swept.zip(bruteMinimax(blocks)).foreach { case (r, (bp, bn)) =>
        BigInt(r._4) * bn shouldBe bp * BigInt(r._5)
      }
    }
  }

  test("isotonicFit refuses an unquantized (over-grid) score loudly") {
    val big = spark.range(Calibrate.MaxGridBlocks + 1)
      .select(col("id").as("s"), (col("id") % 2 === 0).as("y"))
    val e = intercept[IllegalArgumentException] {
      Calibrate.isotonicFit(big, col("s"), col("y"))
    }
    e.getMessage should include("distinct quantized scores")
  }

  test("isotonicApply refuses an unquantized (over-grid) scored column loudly") {
    // the serve-side twin of the fit guard: the merged-grid window is
    // UNPARTITIONED and the lookup broadcasts — an unquantized score
    // column must refuse, not silently become a corpus-sized
    // single-task sort + driver broadcast
    val fit = Calibrate.isotonicFit(
      Seq((1L, true), (2L, false), (2L, true)).toDF("s", "y"),
      col("s"), col("y"))
    val scored = spark.range(Calibrate.MaxGridBlocks + 1)
      .select(col("id"), col("id").as("s"))
    val e = intercept[IllegalArgumentException] {
      Calibrate.isotonicApply(fit, scored, col("s"))
    }
    e.getMessage should include("serve side")
  }

  test("isotonicFromHistogram re-reduces duplicate score_q rows (un-grouped store read)") {
    // duplicate blocks from an un-grouped read must fold into one
    // block, not become duplicate PAV blocks with nondeterministic
    // serve order
    val clean = Seq((1L, 4L, 1L), (2L, 4L, 3L))
      .toDF("score_q", "n", "n_pos")
    val dup = Seq((1L, 2L, 1L), (1L, 2L, 0L), (2L, 4L, 3L))
      .toDF("score_q", "n", "n_pos")
    Calibrate.isotonicFromHistogram(dup).orderBy("score_q").collect() shouldBe
      Calibrate.isotonicFromHistogram(clean).orderBy("score_q").collect()
  }

  test("isotonicApply refuses an empty fit loudly") {
    val fit = Seq.empty[(Long, Long, Long, Long, Long, Long)]
      .toDF("score_q", "n", "n_pos", "fit_pos", "fit_n", "fit_q")
    val scored = Seq((1L, 5L)).toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      Calibrate.isotonicApply(fit, scored, col("s"))
    }
    e.getMessage should include("empty fit")
  }

  test("isotonicFromHistogram fits the same calibrator as the raw frame") {
    val df = Seq((1L, false), (1L, true), (2L, true), (3L, false),
      (3L, true), (7L, false)).toDF("s", "y")
    val hist = df.groupBy(col("s").as("score_q"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"))
    Calibrate.isotonicFromHistogram(hist).orderBy("score_q").collect() shouldBe
      Calibrate.isotonicFit(df, col("s"), col("y")).orderBy("score_q").collect()
  }

  test("isotonicFit reduces the frame to the same sweep") {
    val df = Seq((1L, false), (1L, true), (2L, true), (2L, true),
      (3L, false), (3L, false), (3L, true), (5L, true))
      .toDF("s", "y")
    val got = Calibrate.isotonicFit(df, col("s"), col("y"))
      .orderBy(col("score_q"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    got shouldBe Calibrate.pav(Seq((1L, 2L, 1L), (2L, 2L, 2L),
      (3L, 3L, 1L), (5L, 1L, 1L)))
  }
}
