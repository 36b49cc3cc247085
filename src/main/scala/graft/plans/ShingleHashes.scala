package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed word-n-gram shingles of a token array, in one pass.
  *
  * Equivalent to `transform(array_distinct(transform(sequence(0, m-n),
  * i => concat_ws(" ", slice(toks, i+1, n)))), s => xxhash64(s))` — which
  * runs INTERPRETED (higher-order functions break codegen) and allocates a
  * slice array + joined string + per-element dispatch per shingle; measured
  * as the dominant cost of the MinHash/Jaccard pipelines. This expression
  * walks the token `ArrayData` once per row: window-join with
  * `UTF8String.concatWs`, hash with the same seeded XXH64 the SQL
  * `xxhash64` uses (seed 42), dedup via hash set, insertion order kept.
  *
  * (Dedup is by 64-bit hash rather than by string — indistinguishable to
  * every consumer, which joins/intersects on the hash anyway.)
  *
  * `portable = true` swaps XXH64 for the engine-portable 60-bit md5
  * prefix (`graft.ext.PortableHash`) — byte-identical to SQL
  * `conv(substring(md5(shingle), 1, 15), 16, 10)` on the space-joined
  * shingle string, so a second engine can replay the sketch exactly;
  * same single pass, one MessageDigest reused across the row.
  */
case class ShingleHashes(child: Expression, n: Int,
    portable: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  require(n > 0)

  @transient private lazy val md5 =
    java.security.MessageDigest.getInstance("MD5")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val count = m - n + 1
    val sep = UTF8String.fromString(" ")
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    val out = new Array[Long](count)
    val window = new Array[UTF8String](n)
    var cnt = 0
    var i = 0
    while (i < count) {
      var j = 0
      while (j < n) { window(j) = toks.getUTF8String(i + j); j += 1 }
      val s = UTF8String.concatWs(sep, window: _*)
      val h =
        if (portable) {
          md5.reset()
          graft.ext.PortableHash.md5Prefix15(md5.digest(s.getBytes))
        } else XxHash64Function.hash(s, StringType, 42L)
      if (seen.add(h)) { out(cnt) = h; cnt += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
