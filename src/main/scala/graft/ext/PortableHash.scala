package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hashing for sketches whose whole pipeline must be
  * replayable bit-for-bit by a second engine (the CMS / DSIR bucketing
  * discipline, generalized): every primitive here is (a) exact integer
  * arithmetic, (b) defined identically in Spark SQL, DuckDB SQL, and
  * plain JVM code, and (c) cheap enough to sit in a hot sketch loop.
  *
  * Two primitives:
  *   - the 60-bit md5 prefix — `conv(substring(md5(s), 1, 15), 16, 10)`
  *     in Spark, `CAST('0x' || substring(md5(s), 1, 15) AS UBIGINT)` in
  *     DuckDB, [[md5Prefix15]] on the JVM. 15 hex chars = 60 bits keeps
  *     every value comfortably inside a signed 64-bit lane on ALL
  *     engines (16 chars would straddle the BIGINT sign bit).
  *   - the affine family over the Mersenne prime p = 2^61 - 1 —
  *     h_k = (a_k·h + b_k) mod p, the classic universal-hash family
  *     MinHash needs, with (a_k, b_k) themselves derived from md5 so a
  *     replaying engine can generate the family inline instead of
  *     pasting 128 constants. 128-bit products reduce without division
  *     ([[affine]]): 2^61 ≡ 1 (mod p) makes the fold two shifts.
  *
  * The xxhash64 family stays the default for throughput-only paths —
  * this one exists for pipelines that want the reconciliation property,
  * and costs one md5 per hashed token/shingle (measured ≈ 2-3× an
  * xxhash64 on the same bytes; the A/B lives in BENCH_NOTES).
  */
object PortableHash {

  /** 2^61 - 1 — the Mersenne prime the affine family works over. */
  val P: Long = (1L << 61) - 1

  /** JVM twin of the SQL 15-hex-char md5 prefix (60 bits). */
  def md5Prefix15(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    md5Prefix15(d)
  }

  /** Same, over an already-computed 16-byte digest: the first 15 hex
    * chars are bytes 0..6 plus the high nibble of byte 7.
    */
  def md5Prefix15(digest: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    (v << 4) | ((digest(7) & 0xf0L) >>> 4)
  }

  /** Column form (codegen'd built-ins only). */
  def md5Prefix15(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Multiplier of family member k: nonzero mod p. Replay:
    * `(CAST('0x'||substring(md5('a:'||k),1,15) AS UBIGINT) % (p-1)) + 1`.
    */
  def familyA(k: Int): Long = md5Prefix15("a:" + k) % (P - 1) + 1

  /** Offset of family member k. Replay:
    * `CAST('0x'||substring(md5('b:'||k),1,15) AS UBIGINT) % p`.
    */
  def familyB(k: Int): Long = md5Prefix15("b:" + k) % P

  /** (a·h + b) mod p, exact, for 0 ≤ a,b < p and 0 ≤ h < 2^61 — the JVM
    * twin of HUGEINT `(a * h + b) % p`. The 122-bit product folds via
    * 2^64 ≡ 8 (mod p): x = hi·2^64 + lo ≡ hi·8 + lo.
    */
  def affine(a: Long, h: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, h) // a,h < 2^61 → exact, positive
    val lo = a * h // low 64 bits (wrapped)
    var r = ((hi << 3) | (lo >>> 61)) + (lo & P)
    r = (r >>> 61) + (r & P)
    if (r >= P) r -= P
    var s = r + b
    s = (s >>> 61) + (s & P)
    if (s >= P) s -= P
    s
  }
}
