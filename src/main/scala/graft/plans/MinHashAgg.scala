package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native min-hash signature aggregate: folds a column of 64-bit shingle
  * hashes into an `array<long>` of `numHashes` per-family minima, where the
  * k-th family re-hashes the shingle with seed k (XXH64).
  *
  * The declarative form (`numHashes` separate `min(xxhash64(h, k))`
  * aggregates) walks an expression tree per family per row — the measured
  * dominant cost of the MinHash pipeline. This aggregate does the whole
  * family loop as primitive JVM arithmetic on a single `Array[Long]`
  * buffer: one `child.eval` per row, then `numHashes` static XXH64 calls
  * with no boxing, null checks, or per-family expression dispatch.
  * Partial aggregation still happens map-side (ObjectHashAggregate), so
  * only `numHashes` longs per group reach the shuffle — same plan shape as
  * the expression form, ~4-5× less CPU.
  *
  * (The estimator family differs from SQL `xxhash64(h, k)` only in seed
  * construction — any independent seeded family is valid for MinHash;
  * consumers only require internal consistency, which `DedupSpec` and the
  * `x_dedup_minhash_recall` gate assert.)
  *
  * `portable = true` swaps the XXH64 family for the engine-portable
  * affine family over 2^61-1 (`graft.ext.PortableHash.affine`, constants
  * from md5 of "a:k"/"b:k") — a second engine can regenerate the exact
  * family in SQL and replay the signature bit-for-bit. Same primitive
  * JVM loop: the md5s happen once at plan build (128 constants), each
  * row update is two multiplies + shifts per family member.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
    portable: Boolean = false,
) extends TypedImperativeAggregate[Array[Long]] {

  require(numHashes > 0)

  @transient private lazy val famA: Array[Long] =
    Array.tabulate(numHashes)(graft.ext.PortableHash.familyA)
  @transient private lazy val famB: Array[Long] =
    Array.tabulate(numHashes)(graft.ext.PortableHash.familyB)

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var k = 0
      if (portable) {
        while (k < numHashes) {
          val hk = graft.ext.PortableHash.affine(famA(k), h, famB(k))
          if (hk < buf(k)) buf(k) = hk
          k += 1
        }
      } else {
        while (k < numHashes) {
          val hk = XXH64.hashLong(h, k.toLong)
          if (hk < buf(k)) buf(k) = hk
          k += 1
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numHashes) {
      if (other(k) < buf(k)) buf(k) = other(k)
      k += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * numHashes)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](numHashes)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
}
