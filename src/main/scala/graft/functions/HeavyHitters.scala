package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch: at most `k` counters, each arrival
  * either increments its counter, claims a free slot, or decrements every
  * counter (dropping zeros) — the classic amortized-O(1) heavy-hitters
  * summary. Merge follows Agarwal et al.'s mergeable-summaries rule:
  * sum counters, then if more than `k` survive, subtract the (k+1)-th
  * largest count from all and keep the positives.
  *
  * Guarantees (spec-pinned): every item with true frequency > n/(k+1)
  * is retained, and each estimate lies in [true - n/(k+1), true] — under
  * ANY merge order/split. When the true distinct count is <= k the
  * sketch never evicts and is EXACT (counts equal groupBy counts), which
  * is what the oracle checks.
  */
final class MGSketch(val k: Int) {
  val counts = new java.util.HashMap[String, Long]()
  var processed: Long = 0L

  def add(item: String): Unit = {
    processed += 1
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + 1)
    else if (counts.size < k) counts.put(item, 1L)
    else {
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  def mergeIn(other: MGSketch): Unit = {
    processed += other.processed
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, cur + e.getValue)
    }
    if (counts.size > k) {
      // subtract the (k+1)-th largest count, keep strict positives
      val vals = new Array[Long](counts.size)
      var i = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - k - 1) // (k+1)-th largest
      val ei = counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        if (e.getValue - cut <= 0L) ei.remove() else e.setValue(e.getValue - cut)
      }
    }
  }

  /** Retained items, (count desc, item asc) — a total order. */
  def sorted: Array[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    counts.entrySet().asScala.toArray
      .map(e => (e.getKey, e.getValue.longValue()))
      .sortBy { case (item, c) => (-c, item) }
  }

  def serialize: Array[Byte] = {
    val entries = sorted.map { case (s, c) => (s.getBytes(StandardCharsets.UTF_8), c) }
    val bb = ByteBuffer.allocate(16 + entries.map(_._1.length + 12).sum)
    bb.putLong(processed)
    bb.putInt(entries.length)
    entries.foreach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }
}

object MGSketch {
  def deserialize(k: Int, bytes: Array[Byte]): MGSketch = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new MGSketch(k)
    s.processed = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      s.counts.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    s
  }
}

/** `heavy_hitters(item, k)`: the Misra-Gries sketch as a native
  * `TypedImperativeAggregate`. Partial state is <= k counters per group
  * regardless of input size or item cardinality — the bounded-state
  * alternative to an exact per-group frequency map when the item domain
  * is unbounded (URLs, tokens, user agents) at 100 TB. Output:
  * array<struct<item string, est_count bigint>> in (count desc, item
  * asc) order.
  */
case class HeavyHittersAgg(
    itemChild: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGSketch] {

  require(k >= 1, "heavy_hitters requires k >= 1")

  override def children: Seq[Expression] = Seq(itemChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    new StructType().add("item", StringType).add("est_count", LongType),
    containsNull = false)

  override def createAggregationBuffer(): MGSketch = new MGSketch(k)

  override def update(buf: MGSketch, input: InternalRow): MGSketch = {
    val item = itemChild.eval(input)
    if (item != null) buf.add(item.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MGSketch, other: MGSketch): MGSketch = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: MGSketch): Any =
    new GenericArrayData(buf.sorted.map { case (item, c) =>
      InternalRow(UTF8String.fromString(item), c)
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: MGSketch): Array[Byte] = buf.serialize
  override def deserialize(bytes: Array[Byte]): MGSketch =
    MGSketch.deserialize(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(itemChild = newChildren(0))

  override def prettyName: String = "heavy_hitters"
}
