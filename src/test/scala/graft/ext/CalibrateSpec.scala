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
