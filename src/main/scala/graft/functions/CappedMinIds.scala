package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded aggregation buffer for [[CappedMinIds]]: the bucket's total
  * cardinality plus its `cap` smallest ids, maintained as a max-heap
  * (O(log cap) insert, O(cap) memory — NEVER proportional to the
  * bucket). Merging two buffers is heap-insertion of the smaller one's
  * elements, so partial (map-side) aggregation composes and the result
  * is independent of arrival order.
  */
final class CappedIdsBuffer(val cap: Int) {
  var total: Long = 0L
  // max-heap of the smallest `cap` ids seen so far
  val heap = new java.util.PriorityQueue[java.lang.Long](
    java.util.Comparator.reverseOrder[java.lang.Long]())

  def add(v: Long): Unit = {
    total += 1
    if (heap.size < cap) heap.add(v)
    else if (heap.peek() > v) { heap.poll(); heap.add(v) }
  }

  def mergeIn(other: CappedIdsBuffer): Unit = {
    total += other.total
    val it = other.heap.iterator()
    while (it.hasNext) {
      val v = it.next().longValue()
      if (heap.size < cap) heap.add(v)
      else if (heap.peek() > v) { heap.poll(); heap.add(v) }
    }
  }

  /** Ascending array of the kept ids (complete iff total <= cap). */
  def sortedIds: Array[Long] = {
    val out = new Array[Long](heap.size)
    val it = heap.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    java.util.Arrays.sort(out)
    out
  }
}

/** `capped_min_ids(id, cap)` — aggregate a bucket into
  * `struct(total: long, ids: array<long>)` where `ids` is the `cap`
  * smallest ids ascending and `total` is the true bucket size.
  *
  * This is the scale-safe replacement for `collect_list` in the
  * bucket-join dedup pattern ([[graft.text.Dedup.bucketPairs]]): a hot
  * LSH bucket (a boilerplate cluster of 10⁶+ identical documents)
  * previously materialized as ONE `collect_list` aggregation-buffer
  * row — un-splittable by AQE, guaranteed OOM at 100 TB. Here the
  * buffer is O(cap) regardless of bucket size, partial aggregation
  * still combines map-side, and the caller learns both the true size
  * (`total`, for the over-cap policy) and the bucket minimum
  * (`ids[0]`, the star-link representative) in the same pass.
  */
case class CappedMinIds(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedIdsBuffer] with UnaryLike[Expression] {

  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def createAggregationBuffer(): CappedIdsBuffer = new CappedIdsBuffer(cap)

  override def update(buffer: CappedIdsBuffer, input: InternalRow): CappedIdsBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: CappedIdsBuffer, other: CappedIdsBuffer): CappedIdsBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: CappedIdsBuffer): Any =
    InternalRow(buffer.total, new GenericArrayData(buffer.sortedIds))

  override def serialize(buffer: CappedIdsBuffer): Array[Byte] = {
    val ids = buffer.sortedIds
    val bb = ByteBuffer.allocate(12 + 8 * ids.length)
    bb.putLong(buffer.total)
    bb.putInt(ids.length)
    var i = 0
    while (i < ids.length) { bb.putLong(ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedIdsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CappedIdsBuffer(cap)
    buf.total = bb.getLong()
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.heap.add(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedMinIds =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedMinIds =
    copy(inputAggBufferOffset = newOffset)

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("ids", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "capped_min_ids"

  override protected def withNewChildInternal(newChild: Expression): CappedMinIds =
    copy(child = newChild)
}
