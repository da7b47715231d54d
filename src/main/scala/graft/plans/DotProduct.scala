package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over ARRAY<DOUBLE> (SURVEY.md §2.3 R19, §2.5).
  *
  * The higher-order formulation `aggregate(zip_with(a,b,(x,y)->x*y),0d,+)`
  * allocates an intermediate array and pays interpreted-lambda dispatch per
  * element; this expression is a single primitive loop. Summation is
  * sequential in index order — the exact same order as the left-fold
  * aggregate — so results are bit-identical to the HOF form and to the
  * DuckDB oracle's per-index join + sum.
  *
  * Generates code (doGenCode) so the hot inner loop of every similarity
  * query stays inside whole-stage codegen instead of falling back to
  * interpreted eval per row pair (the round-3 CodegenFallback cost a
  * virtual call + boxing per pair on the all-pairs audit joins).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Type-check makes the SQL-registered form SAFE: anything but
  // ARRAY<DOUBLE> inputs is an ANALYSIS error (callers cast with
  // asDouble) — without this, getDouble() would read 8-byte slots out of
  // differently-packed int/float array data and return plausible-looking
  // garbage. (ImplicitCastInputTypes would auto-cast, but its
  // AbstractDataType signature is private[sql].)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects (array<double>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  // Length mismatch and null ELEMENTS yield null even for non-null inputs,
  // so the result is always potentially nullable (keeps ev.isNull a real
  // variable in codegen).
  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // Length mismatch is a data error: return null (the HOF form's
    // zip_with null-padding makes the aggregate null too), never a
    // plausible-looking partial sum. A null ELEMENT likewise nulls the
    // HOF aggregate, so it nulls this result — not a silent 0.0 term.
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}
