package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Cols.qcol

/** Media-file ↔ record matching and ZIP-scan filtering.
  *
  * Ports the filename-matching of `processMediaFields`
  * (reference: server/services/csv-import.js:1201-1246): a file matches a
  * record key when the lowercased name is `key.ext` (:1215), `key_\d+.ext`
  * (:1217-1219), or simply starts with the key (:1221-1222) — the prefix
  * rule subsumes the first two. Matched files are sorted by name (:1229-1233,
  * localeCompare) and their ids collected per record.
  *
  * Scale design: a raw prefix match is a theta join (O(files × records) —
  * fine for the reference's one-ZIP uploads, catastrophic at 100 TB). The
  * default path EXTRACTS the candidate key from the filename (longest
  * leading run up to the first `_` or `.`) and equi-joins; it is exact
  * whenever record keys contain no `_`/`.`, which holds for the reference's
  * fixtures (CH001-style). `matchFilesTheta` keeps the literal semantics for
  * irregular keys, guarded to broadcast-sized file sets.
  */
object Media {

  /** System files skipped in ZIP scans: `__MACOSX`, `._*`, dotfiles
    * (reference: server/services/csv-import.js:966-969, :1048-1051).
    */
  def isSystemFile(name: Column): Column = {
    val base = element_at(split(name, "/"), -1)
    name.contains("__MACOSX") || base.startsWith("._") || base.startsWith(".")
  }

  /** Extension → MIME lookup (reference: getMimeType, :1177-1196). */
  val mimeMap: Map[String, String] = Map(
    "jpg" -> "image/jpeg", "jpeg" -> "image/jpeg", "png" -> "image/png",
    "gif" -> "image/gif", "webp" -> "image/webp", "svg" -> "image/svg+xml",
    "pdf" -> "application/pdf", "doc" -> "application/msword",
    "docx" -> "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xls" -> "application/vnd.ms-excel",
    "xlsx" -> "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "mp4" -> "video/mp4", "mp3" -> "audio/mpeg", "wav" -> "audio/wav",
    "txt" -> "text/plain", "csv" -> "text/csv", "zip" -> "application/zip",
  )

  def fileExtension(name: Column): Column =
    lower(regexp_extract(name, "\\.([^.]+)$", 1))

  def mimeType(name: Column): Column = {
    val m = map(mimeMap.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    // try_element_at: plain element_at THROWS on a missing map key under
    // ANSI mode (Spark 4 default) — the octet-stream fallback must fire
    // for unknown/missing extensions, not crash the upload
    coalesce(try_element_at(m, fileExtension(name)), lit("application/octet-stream"))
  }

  /** Keyword classification of files into media-field buckets
    * (reference: filterFilesForMediaField, :1142-1172). Keyword lists are
    * configurable; defaults mirror the reference's domain map.
    */
  val defaultFieldKeywords: Map[String, Seq[String]] = Map(
    "image" -> Seq("image", "img", "photo", "picture"),
    "document" -> Seq("doc", "document", "file", "report"),
    "video" -> Seq("video", "vid", "movie"),
    "audio" -> Seq("audio", "sound", "music"),
  )

  def classifyByKeyword(name: Column, fieldKeywords: Map[String, Seq[String]]): Column = {
    val lname = lower(name)
    fieldKeywords.foldLeft(lit(null).cast("string")) { case (acc, (field, kws)) =>
      val hit = kws.map(kw => lname.contains(kw)).reduce(_ || _)
      when(acc.isNotNull, acc).otherwise(when(hit, lit(field)))
    }
  }

  /** Candidate key embedded in a filename: leading run up to the first
    * `_` or `.` (exact for `key.ext` / `key_N.ext` / `key_suffix` shapes).
    */
  def extractKey(name: Column): Column =
    regexp_extract(element_at(split(name, "/"), -1), "^([^_.]+)", 1)

  /** Equi-join fast path. `files` must have (`nameCol`, `fileIdCol`);
    * `records` must have `keyCol`. Returns records + `matchedCol:
    * array<long>` of file ids sorted by (name, id); empty matches ⇒ null
    * (field dropped, reference :1240-1243).
    *
    * The group-collect runs AFTER a semi-join against the record keys:
    * only file keys some record can actually match ever build an id
    * array. On a big media library the unmatched majority (a record
    * subset import, a shared library) would otherwise be collected,
    * sorted, and shuffled just to be dropped by the final left join.
    * The semi-join needs no distinct — semi output is per-left-row.
    *
    * No forced broadcast anywhere: both joins are plain equi-joins, so
    * Catalyst/AQE picks broadcast when a side is small (runtime stats)
    * and a shuffle hash join when it isn't — same semantics either way.
    */
  def matchFiles(
      records: DataFrame,
      keyCol: String,
      files: DataFrame,
      nameCol: String,
      fileIdCol: String,
      matchedCol: String,
  ): DataFrame = {
    val f = files
      .filter(!isSystemFile(qcol(nameCol)))
      .select(lower(extractKey(qcol(nameCol))).as("__fkey"),
        qcol(nameCol).as("__fname"), qcol(fileIdCol).cast("long").as("__fid"))
    val recordKeys = records.select(lower(trim(qcol(keyCol))).as("__fkey"))
    val grouped = f
      .join(recordKeys, Seq("__fkey"), "left_semi")
      .groupBy(col("__fkey"))
      .agg(transform(array_sort(collect_list(struct(col("__fname"), col("__fid")))),
        e => e("__fid")).as("__ids"))
    records
      .join(grouped, lower(trim(qcol(keyCol))) === col("__fkey"), "left")
      .withColumn(matchedCol, when(size(col("__ids")) > 0, col("__ids")))
      .drop("__fkey", "__ids")
  }

  /** Literal theta-join path (prefix semantics, reference :1221-1222) for
    * irregular keys.
    *
    * Guarded execution: below `broadcastMaxFiles` the file set broadcasts
    * into a nested-loop join (cheapest for dimension-sized file sets —
    * measured faster than banding at bench scale, where the extra band
    * shuffles cost more than the prefix evaluations). Above the guard the
    * prefix predicate decomposes into per-key-length HASH equi-joins
    * (`lname startsWith k` ⇔ `substring(lname, 1, length(k)) = k`):
    * distinct key LENGTHS (bounded by max filename length, never data)
    * reach the driver, each band is an ordinary shuffle-able join —
    * O(matches), not O(keys × files), so a 100 TB media library never
    * meets an unguarded broadcast. Specs assert both paths agree.
    */
  def matchFilesTheta(
      records: DataFrame,
      keyCol: String,
      files: DataFrame,
      nameCol: String,
      fileIdCol: String,
      matchedCol: String,
      broadcastMaxFiles: Long = 1000000L,
      /** caller-known (upper bound on the) file count: skips the guard's
        * count action AND the internal persist — pass it when `files` is
        * already persisted (the Engine computes all per-field counts in one
        * aggregate over its cached library)
        */
      knownFileCount: Option[Long] = None,
  ): DataFrame = {
    // value-keyed: the match set depends only on the key value, so the
    // theta join runs over DISTINCT keys and equi-joins back by value (row
    // keys are not stable across plan branches)
    // persisted BEFORE the guard count (unless the caller supplied one):
    // otherwise an unpersisted library frame pays its full upstream
    // pipeline twice (guard scan + join scan)
    val fBase = files
      .filter(!isSystemFile(qcol(nameCol)))
      .select(lower(element_at(split(qcol(nameCol), "/"), -1)).as("__lname"),
        qcol(nameCol).as("__fname"), qcol(fileIdCol).cast("long").as("__fid"))
    // lineage-cut materialization rather than persist: same spill behavior
    // (MEMORY_AND_DISK), no cacheManager entry left behind after the query
    val f =
      if (knownFileCount.isDefined) fBase
      else fBase.localCheckpoint(eager = true)
    val keys = records
      .select(lower(trim(qcol(keyCol))).as("__k"))
      .filter(col("__k") =!= "").distinct()
    val pairs =
      if (knownFileCount.getOrElse(f.count()) <= broadcastMaxFiles)
        keys.join(broadcast(f), col("__lname").startsWith(col("__k")))
      else {
        // keys also re-read once per band
        val kp = keys.localCheckpoint(eager = true)
        val lens = kp.select(length(col("__k")).as("__len")).distinct()
          .collect().map(_.getInt(0)).filter(_ > 0).sorted
        lens.map { len =>
          kp.filter(length(col("__k")) === len)
            .join(f.withColumn("__pfx", substring(col("__lname"), 1, len)),
              col("__pfx") === col("__k"))
            .drop("__pfx")
        }.reduceOption(_ unionByName _)
          .getOrElse(kp.limit(0).crossJoin(f.limit(0)))
      }
    val matches = pairs
      .groupBy(col("__k"))
      .agg(transform(array_sort(collect_list(struct(col("__fname"), col("__fid")))),
        e => e("__fid")).as("__ids"))
    // one row per MATCHED KEY — AQE broadcasts when small, shuffles when not
    records.join(matches, lower(trim(qcol(keyCol))) === col("__k"), "left")
      .withColumn(matchedCol, when(size(col("__ids")) > 0, col("__ids")))
      .drop("__k", "__ids")
  }
}
