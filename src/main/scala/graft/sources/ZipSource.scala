package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

/** ZIP archive scan (SURVEY §2.1 S5/S6).
  *
  * Ports `extractAndUploadZip` / `extractAndProcessMediaZip` (reference:
  * server/services/csv-import.js:808-926, :931-1137): enumerate entries,
  * skip directories and system files (`__MACOSX`, `._*`, dotfiles), bucket
  * entries into media fields by path segment, dedup identical files.
  *
  * Scale: `binaryFile` reads each archive as one row, then entries are
  * expanded per-partition with `java.util.zip` — one task per archive, no
  * driver involvement; a directory of thousands of ZIPs fans out across the
  * cluster. (The reference caps uploads at 10 MB per file, so whole-archive
  * byte arrays per task are safe; huge archives would need a streaming
  * source instead.)
  */
object ZipSource {

  final case class ZipEntryRow(
      archive: String,
      name: String,
      size: Long,
      bytes: Array[Byte],
  )

  /** All non-directory, non-system entries of every `*.zip` under `path`. */
  def readZips(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.zip")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    bin.mapPartitions(_.flatMap { case (archive, content) =>
      entriesOf(archive, content)
    }).toDF()
  }

  /** Pure entry expansion — also used directly in tests. */
  def entriesOf(archive: String, content: Array[Byte]): Iterator[ZipEntryRow] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(content))
    Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
      .filterNot(_.isDirectory)
      .map { e =>
        val bytes = zin.readAllBytes()
        ZipEntryRow(archive, e.getName, bytes.length.toLong, bytes)
      }
      .filterNot(e => isSystemEntry(e.name))
  }

  /** System-entry predicate mirroring the reference's skip list
    * (reference: server/services/csv-import.js:826, :966-969, :1048-1051).
    */
  def isSystemEntry(name: String): Boolean = {
    val base = name.split("/").last
    name.contains("__MACOSX") || base.startsWith("._") || base.startsWith(".")
  }

  /** S6: classify entries into media-field buckets by path segment equal to
    * a media field name; everything else lands in the general pool (null
    * bucket). (reference: :961-1021)
    */
  def bucketByField(entries: DataFrame, mediaFields: Seq[String]): DataFrame = {
    val segs = split(col("name"), "/")
    val bucket = mediaFields.foldLeft(lit(null).cast("string")) { (acc, f) =>
      when(acc.isNotNull, acc).otherwise(when(array_contains(segs, f), lit(f)))
    }
    entries.withColumn("bucket", bucket)
  }

  /** J8: unique files keyed (name, size) kept once — the reference's
    * upload-once cache (reference: :1024-1036, :1105-1116).
    */
  def dedupEntries(entries: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = element_at(split(col("name"), "/"), -1)
    val w = Window.partitionBy(base, col("size")).orderBy(col("archive"), col("name"))
    entries.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
