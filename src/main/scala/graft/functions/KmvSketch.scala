package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Buffer for [[KmvSketch]]: the `cap` smallest DISTINCT hash values
  * seen so far, as a sorted set (O(log cap) insert, O(cap) memory).
  *
  * Unlike [[CappedIdsBuffer]] this buffer dedupes — the K-minimum-
  * values estimator needs the k-th smallest *distinct* hash, so a
  * value already present is a no-op. Merge is insertion of the other
  * buffer's elements, so partial (map-side) aggregation composes and
  * the result is independent of arrival order and duplication.
  */
final class KmvBuffer(val cap: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()

  def add(v: Long): Unit = {
    if (set.size < cap) { set.add(v); () }
    else if (set.last() > v && set.add(v)) { set.pollLast(); () }
  }

  def mergeIn(other: KmvBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) add(it.next().longValue())
  }
}

/** `kmv_sketch(hash, cap)` — aggregate a group's hash values into
  * `struct(n_kept: long, kth: long, ks: array<long>)`: the number of
  * distinct hashes retained (= min(cap, true distinct count)), the
  * largest retained one (the `n_kept`-th smallest distinct hash
  * overall), and the retained values ascending — the sketch itself,
  * which downstream set arithmetic (union/intersection estimation,
  * `q_kmv_overlap`) consumes.
  *
  * This is the K-minimum-values distinct sketch (Bar-Yossef et al.):
  * for hashes uniform on [0, M), `(cap-1) * M / kth` estimates the
  * distinct count once `n_kept == cap`, and `n_kept` IS the exact
  * distinct count while the set still fits. State is O(cap) longs per
  * group regardless of input size, partials combine map-side, and —
  * unlike HLL — two sketches intersect/union by set arithmetic on
  * their value sets, which is why KMV is the sketch of choice for
  * cross-corpus overlap estimation at 100 TB. The estimator itself is
  * exact integer/sorted-set arithmetic, so the DuckDB oracle can
  * replicate it bit-for-bit (`q_kmv_distinct`).
  */
case class KmvSketch(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression]
  with ExpectsInputTypes {

  require(cap >= 2, s"cap must be >= 2, got $cap")

  // Analysis-time contract (matches CappedMinIds): update() trusts the
  // child to produce a Long, so a non-Long child must fail at plan
  // time, not as a runtime ClassCastException deep in an executor.
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(cap)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: KmvBuffer): Any = {
    val n = buffer.set.size
    val ks = new Array[Long](n)
    val it = buffer.set.iterator()
    var i = 0
    while (it.hasNext) { ks(i) = it.next().longValue(); i += 1 }
    InternalRow(n.toLong, if (n == 0) 0L else ks(n - 1),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(ks))
  }

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buffer.set.size)
    bb.putInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(cap)
    var i = 0
    while (i < n) { buf.set.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", LongType, nullable = false),
    StructField("kth", LongType, nullable = false),
    StructField("ks", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}
