package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.functions.{CosineSimilarity, CosineToConst}

/** Catalyst optimizer rule: cosine against a plan-time constant vector
  * needs the constant's norm computed ONCE, not once per row.
  *
  * The map-only k-means / IVF assignment pattern inlines centroids as
  * `typedlit` literals and evaluates `cosine_similarity(embedding,
  * centroid_k)` for every (row, centroid) pair — the generic kernel
  * re-accumulates the centroid's |b|² (dim multiplies + a sqrt) on every
  * one of those evaluations. This rule rewrites
  * `CosineSimilarity(x, Literal)` (either side) to [[CosineToConst]]
  * with the norm folded at optimization time, removing a third of the
  * hot-loop multiplies. Cosine is symmetric and both of its per-side
  * folds are independent accumulators, so the rewrite is bit-identical
  * in every case, including the zero-norm guard (spec-pinned).
  *
  * Registered through `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.GraftExtensions]]) — user code keeps writing the generic
  * form; the plan gets the specialized kernel.
  */
object PrenormalizeLiteralCosine extends Rule[LogicalPlan] {

  private def toConst(other: org.apache.spark.sql.catalyst.expressions.Expression,
                      lit: Literal): CosineToConst = {
    val arr = lit.value.asInstanceOf[ArrayData].toFloatArray()
    CosineToConst(other, arr.toSeq, CosineToConst.normPrefix(arr, arr.length))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case CosineSimilarity(a, l @ Literal(v, ArrayType(FloatType, _))) if v != null =>
      toConst(a, l)
    case CosineSimilarity(l @ Literal(v, ArrayType(FloatType, _)), a) if v != null =>
      toConst(a, l)
  }
}
