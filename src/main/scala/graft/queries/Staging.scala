package graft.queries

/** Staging-path tag for idempotent /tmp input prep.
  *
  * The tag embeds a CONTENT FINGERPRINT (name + size + mtime of every
  * parquet file in the source sf dir, MD5'd) alongside the sanitized dir
  * name: two distinct input dirs that sanitize to the same string can no
  * longer collide, and regenerating table data in-place at the same path
  * changes the fingerprint — so stale staged files are abandoned instead
  * of silently reused (they produce confusing oracle mismatches otherwise).
  */
object Staging {
  def tag(dir: String): String = {
    val base = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val entries = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    // sf tables are Spark-written DIRECTORIES named <table>.parquet; a
    // directory's own length/mtime does not reliably change when a data
    // file inside is rewritten in place — fingerprint the data files one
    // level down, not the directory entry
    val listing = entries.flatMap { f =>
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
          .sortBy(_.getName)
          .map(c => s"${f.getName}/${c.getName}:${c.length}:${c.lastModified}")
      else Array(s"${f.getName}:${f.length}:${f.lastModified}")
    }.mkString("|")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(listing.getBytes("UTF-8"))
    s"${base}_${md5.take(6).map("%02x".format(_)).mkString}"
  }
}
