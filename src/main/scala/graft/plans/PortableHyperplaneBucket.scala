package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native form of the ENGINE-PORTABLE hyperplane LSH bucket
  * (`Similarity.hyperplaneBucketPortable`): quantize the vector to 1e-6
  * resolution (half-away-from-zero, the decimal rounding rule engines
  * share), dot it against `nBits` md5-derived integer hyperplanes, emit
  * the sign-bit bucket. One pass over the primitive `ArrayData` with a
  * precomputed `nBits × dim` plane matrix — the declarative
  * `transform`/`zip_with`/`aggregate` chain runs interpreted and
  * re-walks the vector per plane, measured ≈ 2× on the LSH stage
  * (BENCH_NOTES r12 A/B); this expression removes that surcharge while
  * producing BIT-IDENTICAL buckets on well-formed vectors
  * (`PortableHashSpec` pins equality against the declarative chain; the
  * `x_dedup_embcos_lsh` oracle replays the arithmetic in SQL).
  * Malformed vectors (wrong length, null element) fail loudly here,
  * where the HOF form would fold their null dots into bucket 0 — a
  * blocking key that pools every malformed vector is a data bug.
  *
  * The integer contract, shared with the DuckDB replay:
  *   q_j    = round(x_j · 10^6) as int64 (ties away from zero)
  *   w_kj   = md5Prefix15("hp:k:j") % 2001 − 1000
  *   bit k  = (Σ_j q_j · w_kj) > 0
  * All arithmetic exact in 64-bit lanes (|q| ≲ 10^13 before overflow
  * at |x| ≲ 10^7 — embedding components are O(1)).
  */
case class PortableHyperplaneBucket(child: Expression, dim: Int, nBits: Int)
    extends UnaryExpression with CodegenFallback {

  require(dim > 0 && nBits > 0 && nBits <= 30,
    s"bad bucket geometry: dim=$dim nBits=$nBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got ${dt.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_bucket_portable"

  // lazy: the constructor also runs on UNRESOLVED children (analyzer
  // copies), where dataType must not be touched
  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** nBits × dim integer planes, derived once at plan build. */
  @transient private lazy val planes: Array[Array[Long]] =
    Array.tabulate(nBits)(k => Array.tabulate(dim)(j =>
      graft.ext.PortableHash.md5Prefix15(s"hp:$k:$j") % 2001 - 1000))

  /** round-half-away-from-zero of v — BigDecimal HALF_UP semantics,
    * exact for |v| < 2^52 (v + 0.5 is then an exact double sum).
    */
  private def q(v: Double): Long =
    if (v >= 0) math.floor(v + 0.5).toLong else -math.floor(-v + 0.5).toLong

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    // loud contract (the pcaRotation discipline): a short or null-holed
    // vector would otherwise silently land in a catch-all bucket (the
    // declarative HOF form folds its null dots to bucket 0) — for a
    // BLOCKING key that means malformed vectors all pair with each
    // other, which is a data bug worth naming at the boundary
    require(arr.numElements() == dim,
      s"$prettyName expects exactly $dim elements, got ${arr.numElements()}")
    val qv = new Array[Long](dim)
    var j = 0
    while (j < dim) {
      require(!arr.isNullAt(j), s"$prettyName: null element at position $j")
      val x = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      qv(j) = q(x * 1e6)
      j += 1
    }
    val n = dim
    var bucket = 0
    var k = 0
    while (k < nBits) {
      val w = planes(k)
      var dot = 0L
      var i = 0
      while (i < n) { dot += qv(i) * w(i); i += 1 }
      if (dot > 0) bucket |= (1 << k)
      k += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): PortableHyperplaneBucket =
    copy(child = newChild)
}
