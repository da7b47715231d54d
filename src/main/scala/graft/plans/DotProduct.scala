package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over ARRAY<DOUBLE> (SURVEY.md §2.3 R19, §2.5).
  *
  * The higher-order formulation `aggregate(zip_with(a,b,(x,y)->x*y),0d,+)`
  * allocates an intermediate array and pays interpreted-lambda dispatch per
  * element; this expression is a single primitive loop. Summation is
  * sequential in index order — the exact same order as the left-fold
  * aggregate — so results are bit-identical to the HOF form and to the
  * DuckDB oracle's per-index join + sum.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // Length mismatch is a data error: return null (the HOF form's
    // zip_with null-padding makes the aggregate null too), never a
    // plausible-looking partial sum.
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}
