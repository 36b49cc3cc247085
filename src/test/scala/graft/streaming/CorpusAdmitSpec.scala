package graft.streaming

import graft.SparkSpec
import graft.ext.{CorpusClean, Dedup}
import org.apache.spark.sql.functions._

/** Streaming corpus admission: final admitted view equals the batch
  * clean → near-dup-resolve prefix, including cluster MERGES that
  * revoke a previously-canonical document; micro-batch redelivery is a
  * no-op on the admitted set.
  */
class CorpusAdmitSpec extends SparkSpec {
  import spark.implicits._

  private val enPrefix = "the a of to in is it that for and"
  private def toks(p: String, n: Int) =
    (0 until n).map(i => p + ('a' + i).toChar).mkString(" ")
  // 1: X, 2: exact copy of X, 3: Y (not similar to X), 4: independent,
  // 5: half-X half-Y bridge (similar to BOTH — the merge event),
  // 6: too short (quality-rejected), 7: German (language-rejected)
  private def docs = Seq(
    (1L, s"$enPrefix ${toks("xx", 20)}"),
    (2L, s"$enPrefix ${toks("xx", 20)}"),
    (3L, s"$enPrefix ${toks("yy", 20)}"),
    (4L, s"$enPrefix ${toks("zz", 20)}"),
    (5L, s"$enPrefix ${toks("xx", 10)} ${toks("yy", 10)}"),
    (6L, "tiny doc way too short"),
    (7L, "der die das und ist nicht ein mit auf " + toks("gg", 15)),
  )
  private val cfg = CorpusClean.Config(minTokens = 20, minAlphaRatio = 0.5,
    languages = Set("en"))
  private val thr = 0.3

  private def spool(dir: String, slices: Seq[Seq[Long]],
      extraDup: Option[Seq[Long]] = None): String = {
    new java.io.File(dir).mkdirs()
    val d = docs.toDF("doc_id", "text")
    def put(ids: Seq[Long], i: Int): Unit = {
      val stage = s"$dir/.stage_$i"
      d.filter($"doc_id".isin(ids: _*)).coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val tgt = new java.io.File(dir, f"spool_$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, tgt.toPath)
      tgt.setLastModified(1600000000000L + i * 60000L)
    }
    slices.zipWithIndex.foreach { case (ids, i) => put(ids, i) }
    extraDup.foreach(ids => put(ids, slices.length)) // redelivered batch
    dir
  }

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  private def admitted(store: String): Set[Long] =
    DocStreams.readAdmitted(spark, store).as[Long].collect().toSet

  private def batchExpected: Set[Long] = {
    val cleaned = CorpusClean.clean(docs.toDF("doc_id", "text"),
      "doc_id", "text", cfg)
    val pairs = Dedup.minhashCandidates(cleaned, "doc_id", "text",
      minEstJaccard = thr, portable = true)
    Dedup.dropNearDuplicates(cleaned, "doc_id", pairs)
      .select($"doc_id").as[Long].collect().toSet
  }

  test("admitted equals batch prefix; a late bridge revokes a canonical") {
    // before the bridge arrives: 1 and 3 are both canonical
    val s1 = spool(tmp("graft_admit1"), Seq(Seq(1L, 6L), Seq(3L, 4L, 7L)))
    val st1 = s"${tmp("graft_admit1s")}/store"
    DocStreams.runCorpusAdmitOnce(spark, s1, st1,
      cleanCfg = cfg, minEstJaccard = thr)
    admitted(st1) shouldBe Set(1L, 3L, 4L)
    // full feed: the copy and the bridge arrive last; the bridge merges
    // {1,2,5} with {3}, demoting 3 — the final view revokes it
    val s2 = spool(tmp("graft_admit2"),
      Seq(Seq(1L, 6L), Seq(3L, 4L, 7L), Seq(2L, 5L)))
    val st2 = s"${tmp("graft_admit2s")}/store"
    DocStreams.runCorpusAdmitOnce(spark, s2, st2,
      cleanCfg = cfg, minEstJaccard = thr)
    val a = admitted(st2)
    a shouldBe Set(1L, 4L)
    a shouldBe batchExpected
  }

  test("a redelivered micro-batch leaves the admitted set unchanged") {
    val s = spool(tmp("graft_admit3"),
      Seq(Seq(1L, 6L), Seq(3L, 4L, 7L), Seq(2L, 5L)),
      extraDup = Some(Seq(2L, 5L)))
    val st = s"${tmp("graft_admit3s")}/store"
    DocStreams.runCorpusAdmitOnce(spark, s, st,
      cleanCfg = cfg, minEstJaccard = thr)
    admitted(st) shouldBe batchExpected
  }
}
