package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded k-minimum-distinct-values aggregate: folds a column of int64
  * hashes into the SORTED array of the k smallest DISTINCT values seen —
  * the KMV sketch primitive ([[graft.ext.Sketch.kmvDistinct]] and the
  * overlap algebra built on it).
  *
  * The declarative form (`distinct()` then a per-group `row_number`
  * window cut) shuffles EVERY distinct hash before cutting: md5
  * prefixes of text are near-unique, so map-side partial aggregation
  * removes almost nothing and at 100 TB the k-row sketch costs a full
  * corpus-wide shuffle plus a per-group sort. This aggregate keeps the
  * running k-min set bounded AT THE MAP SIDE (ObjectHashAggregate
  * partial, the [[MinHashAgg]] precedent): each partition contributes
  * at most k longs per group to the exchange, so the shuffle carries
  * ≤ groups·k·partitions rows instead of the corpus's distinct count,
  * and no per-group sort of corpus-scale data exists anywhere.
  *
  * k-min-of-distinct is associative and duplicate-insensitive (a
  * value already in the set re-inserts as a no-op; a value ≥ the
  * current k-th smallest cannot enter a full set), so the partial
  * merges equal the one-shot cut EXACTLY — the KMV gates' hashes are
  * pinned byte-identical across this replan by construction.
  *
  * Buffer: a TreeSet of ≤ k boxed longs — insert is O(log k), k is
  * sketch-sized (hundreds to a few thousand), and the set serializes
  * as `size` longs. Null inputs carry no distinct identity and are
  * skipped (callers additionally pre-filter, since a null would
  * otherwise have silently shifted the order statistic in the old
  * window form). eval returns the ascending `array<long>`.
  */
case class KMinSetAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 1)

  // analysis-time input contract (r20 ADVICE): update() casts the child
  // value straight to Long, so a non-long child registered through the
  // public SQL surface previously failed at EXECUTOR time with a
  // ClassCastException; checking the type here turns that into a clean
  // analysis error at plan time
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kmin_set requires a BIGINT hash column, got ${other.simpleString}")
    }

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmin_set"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      // strictly below the current k-th smallest: admit, then trim the
      // displaced maximum — add() returning false means h was already
      // present (distinctness is the set's own semantics) and nothing
      // was displaced
      if (buf.add(h)) { buf.pollLast(); () }
    }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long])
      : java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinSetAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinSetAgg =
    copy(inputAggBufferOffset = newOffset)
}
