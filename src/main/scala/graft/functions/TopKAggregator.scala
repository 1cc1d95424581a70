package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregation: exact top-k (value, id) pairs per group,
  * mergeable — the `Aggregator` path for aggregation semantics the
  * built-ins don't cover (SURVEY.md §7.1's "custom agg" slot).
  *
  * The partial state is the per-partition top-k (bounded at k elements),
  * so a group's full value set never concentrates anywhere: map-side
  * partials are k-bounded, merges are k+k -> k. That is what makes an
  * exact top-k aggregation safe at 100 TB where collect-and-sort is not.
  * Ordering is (value desc, id asc) — total, so results are deterministic
  * under any merge order.
  */
case class TopKAggregator(k: Int)
  extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (v, id) => (-v, id) }

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Long, Double)): Seq[(Double, Long)] =
    ((in._2, in._1) +: buf).sorted(ord).take(k)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf.sorted(ord)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}
