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
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    val listing = files
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(listing.getBytes("UTF-8"))
    s"${base}_${md5.take(6).map("%02x".format(_)).mkString}"
  }
}
