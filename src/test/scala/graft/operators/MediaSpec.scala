package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Media matcher semantics (reference: processMediaFields,
  * server/services/csv-import.js:1201-1246; FIXTURES.md §2 "CH001" shapes).
  */
class MediaSpec extends SparkSpec {
  import spark.implicits._

  private def files = Seq(
    (1L, "CH001.pdf"),        // exact
    (2L, "CH001_01.pdf"),     // numbered suffix
    (3L, "CH001_report.pdf"), // prefix
    (4L, "CH002.png"),
    (5L, "__MACOSX/CH001.pdf"), // system — ignored
    (6L, "other.txt"),
  ).toDF("fid", "fname")

  private def records = Seq(("r1", "ch001"), ("r2", "CH002"), ("r3", "CH999"))
    .toDF("rid", "key")

  private def matched(df: org.apache.spark.sql.DataFrame): Map[String, Option[Seq[Long]]] =
    df.collect().map { r =>
      r.getAs[String]("rid") ->
        (if (r.isNullAt(r.fieldIndex("m"))) None
         else Some(r.getSeq[Long](r.fieldIndex("m"))))
    }.toMap

  test("fast path: all three filename shapes match, ids sorted by name; miss is null") {
    val out = matched(Media.matchFiles(records, "key", files, "fname", "fid", "m"))
    out("r1") shouldBe Some(Seq(1L, 2L, 3L)) // CH001.pdf < CH001_01.pdf < CH001_report.pdf
    out("r2") shouldBe Some(Seq(4L))
    out("r3") shouldBe None
  }

  test("theta path agrees with fast path on regular keys") {
    val fast = matched(Media.matchFiles(records, "key", files, "fname", "fid", "m"))
    val theta = matched(Media.matchFilesTheta(records, "key", files, "fname", "fid", "m"))
    theta shouldBe fast
  }

  test("theta path handles keys containing separators that break extraction") {
    val oddFiles = Seq((1L, "A_B_1.pdf"), (2L, "A_B_2.pdf"), (3L, "A_C.pdf")).toDF("fid", "fname")
    val oddRecords = Seq(("r1", "A_B")).toDF("rid", "key")
    val theta = matched(Media.matchFilesTheta(oddRecords, "key", oddFiles, "fname", "fid", "m"))
    theta("r1") shouldBe Some(Seq(1L, 2L)) // prefix semantics keep A_B_*, drop A_C
  }

  test("theta above-threshold path (length-banded shuffle joins) agrees with broadcast path") {
    // broadcastMaxFiles = 0 forces the banded fallback on the same inputs
    val banded = matched(Media.matchFilesTheta(records, "key", files, "fname", "fid", "m",
      broadcastMaxFiles = 0L))
    val bnl = matched(Media.matchFilesTheta(records, "key", files, "fname", "fid", "m"))
    banded shouldBe bnl
    banded("r1") shouldBe Some(Seq(1L, 2L, 3L))

    // separator keys of mixed lengths exercise multiple bands at once
    val oddFiles = Seq((1L, "A_B_1.pdf"), (2L, "A_B_2.pdf"), (3L, "A_C.pdf"),
      (4L, "LONGKEY77_x.pdf")).toDF("fid", "fname")
    val oddRecords = Seq(("r1", "A_B"), ("r2", "LONGKEY77"), ("r3", "")).toDF("rid", "key")
    val odd = matched(Media.matchFilesTheta(oddRecords, "key", oddFiles, "fname", "fid", "m",
      broadcastMaxFiles = 0L))
    odd("r1") shouldBe Some(Seq(1L, 2L))
    odd("r2") shouldBe Some(Seq(4L))
    odd("r3") shouldBe None // empty keys never match
  }
}
