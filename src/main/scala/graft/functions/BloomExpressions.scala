package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd membership probe of a pre-built [[BloomFilter]] over a LONG
  * key. The sketch rides into the expression tree (it serializes with
  * the task closure, like a broadcast literal) and codegen references it
  * as a constant object — the probe compiles into the whole-stage loop,
  * no UDF boxing.
  *
  * A Bloom filter has NO false negatives, so `might_contain = false`
  * rows can be dropped before an exact verification join without
  * changing its result; false positives (rate `fpp`) merely ride along
  * until the join kills them. This is the sketch analogue of the
  * stop-shingle prefilter in [[graft.operators.Dedup]].
  */
case class BloomMightContainExpr(child: Expression, bloom: BloomFilter)
  extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}
