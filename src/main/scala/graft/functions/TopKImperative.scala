package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded binary min-heap over (value, id) pairs, ordered so the WORST
  * retained element sits at the root (worst = smallest value, ties broken
  * by larger id — the exact complement of the output order (value desc,
  * id asc)). Insert is O(log k) with zero allocation: two primitive
  * arrays, no boxing, no per-row sort.
  */
final class TopKHeap(val k: Int) {
  private val values = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var count = 0

  def size: Int = count

  /** True if (v1, id1) ranks strictly worse than (v2, id2). */
  private def worse(v1: Double, id1: Long, v2: Double, id2: Long): Boolean =
    v1 < v2 || (v1 == v2 && id1 > id2)

  def insert(value: Double, id: Long): Unit = {
    if (count < k) {
      var i = count
      values(i) = value; ids(i) = id
      count += 1
      // sift up
      while (i > 0 && worse(values(i), ids(i), values((i - 1) / 2), ids((i - 1) / 2))) {
        val p = (i - 1) / 2
        swap(i, p); i = p
      }
    } else if (k > 0 && worse(values(0), ids(0), value, id)) {
      values(0) = value; ids(0) = id
      // sift down
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var w = i
        if (l < count && worse(values(l), ids(l), values(w), ids(w))) w = l
        if (r < count && worse(values(r), ids(r), values(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }

  private def swap(i: Int, j: Int): Unit = {
    val tv = values(i); values(i) = values(j); values(j) = tv
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  /** Fold this heap's elements into `other`. */
  def drainInto(other: TopKHeap): Unit = {
    var i = 0
    while (i < count) { other.insert(values(i), ids(i)); i += 1 }
  }

  /** Elements in output order: value desc, id asc. */
  def sorted: Array[(Double, Long)] = {
    val out = Array.tabulate(count)(i => (values(i), ids(i)))
    scala.util.Sorting.stableSort(out,
      (a: (Double, Long), b: (Double, Long)) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
    out
  }

  def serialize: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * count)
    bb.putInt(count)
    var i = 0
    while (i < count) { bb.putDouble(values(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKHeap {
  def deserialize(k: Int, bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { val v = bb.getDouble; val id = bb.getLong; h.insert(v, id); i += 1 }
    h
  }
}

/** Exact mergeable top-k as a native `TypedImperativeAggregate`: the
  * partial state is a k-bounded primitive heap, so map-side partials are
  * O(k) and a group's full value set never concentrates anywhere — safe at
  * 100 TB where collect-and-sort is not (same algebra as
  * [[TopKAggregator]], which this supersedes on the hot path: the
  * Aggregator re-sorts an immutable Seq per input row and round-trips the
  * buffer through a Catalyst encoder on every update; here update is an
  * O(log k) in-place heap insert and the buffer serializes only at
  * shuffle boundaries).
  *
  * Output: array<struct<value double, id bigint>> ordered (value desc,
  * id asc) — a total order, deterministic under any merge order and
  * bit-identical to [[TopKAggregator]]'s result (spec-pinned).
  */
case class TopKImperative(
    idChild: Expression,
    valueChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, "top_k requires k > 0")

  override def children: Seq[Expression] = Seq(idChild, valueChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    new StructType().add("value", DoubleType).add("id", LongType),
    containsNull = false)

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val id = idChild.eval(input)
    val v = valueChild.eval(input)
    if (id != null && v != null)
      buf.insert(v.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    other.drainInto(buf)
    buf
  }

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sorted.map { case (v, id) =>
      InternalRow(v, id)
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKHeap): Array[Byte] = buf.serialize
  override def deserialize(bytes: Array[Byte]): TopKHeap =
    TopKHeap.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKImperative =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKImperative =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKImperative =
    copy(idChild = newChildren(0), valueChild = newChildren(1))

  override def prettyName: String = "top_k"
}
