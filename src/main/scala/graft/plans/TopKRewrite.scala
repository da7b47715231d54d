package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the ubiquitous window top-k idiom
  *
  *   `row_number().over(Window.partitionBy(keys).orderBy(ord))` + `rk <= k`
  *
  * into the native [[TopKPerKey]] operator. The window formulation fully
  * sorts every key group (O(n log n) map-side even after Spark's own
  * InferWindowGroupLimit, whose partial WindowGroupLimitExec still requires
  * sorted input); TopKPerKey keeps bounded per-key heaps — O(n log k) and
  * at most k rows per (key, partition) enter the shuffle.
  *
  * Matched shape (after the main optimizer batches have collapsed
  * projections): Filter(rank-bound, Window(single row_number alias)), with
  * an optional built-in WindowGroupLimit between Window and its child
  * (superseded by the heap operator, so it is stripped). The rank attribute
  * keeps its ExprId, so downstream references — including the filter
  * replacements elsewhere in the plan — stay resolved.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  /** Above this bound the rewrite declines (code-review r17): the heap
    * operator buffers k rows PER KEY per partition with no spill, so a
    * huge k is better served by the window form's external sort — and
    * the `v - 1` forms must not underflow at Int.MinValue (which turned
    * an always-false rank filter into top-Int.MaxValue = all rows).
    */
  private val MaxRewriteK = 1 << 20

  /** k such that `cond` ⟺ rank ≤ k, if cond is such a bound. Long
    * arithmetic throughout: the strict forms compute v − 1.
    */
  private def boundOf(cond: Expression, rank: ExprId): Option[Long] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType)) if a.exprId == rank => Some(v.toLong)
    case LessThan(a: AttributeReference, Literal(v: Int, IntegerType)) if a.exprId == rank => Some(v.toLong - 1)
    case EqualTo(a: AttributeReference, Literal(v: Int, IntegerType)) if a.exprId == rank && v == 1 => Some(1L)
    case EqualTo(Literal(v: Int, IntegerType), a: AttributeReference) if a.exprId == rank && v == 1 => Some(1L)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: AttributeReference) if a.exprId == rank => Some(v.toLong)
    case GreaterThan(Literal(v: Int, IntegerType), a: AttributeReference) if a.exprId == rank => Some(v.toLong - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, Window(
        Seq(alias @ Alias(WindowExpression(RowNumber(), spec), _)),
        part, order, windowChild, _))
        if spec.partitionSpec == part && spec.orderSpec == order && order.nonEmpty =>
      boundOf(cond, alias.exprId) match {
        case Some(k) if k >= 1 && k <= MaxRewriteK =>
          // Spark's InferWindowGroupLimit may already have slid a
          // WindowGroupLimit under the Window; the heap operator subsumes it.
          val child = windowChild match {
            case WindowGroupLimit(_, _, _, _, inner) => inner
            case other => other
          }
          TopKPerKey(part, order, k.toInt,
            alias.toAttribute.asInstanceOf[AttributeReference], child)
        case _ => f
      }
  }
}

/** Session wiring for the rewrite outside the `spark.sql.extensions` path
  * (tests, library callers): idempotently registers the optimizer rule and
  * the planner strategy it depends on.
  */
object TopKRewrite {
  def enable(spark: SparkSession): Unit = {
    TopK.registerStrategy(spark)
    if (!spark.experimental.extraOptimizations.contains(TopKRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewriteRule
  }
}
