package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native IVF E-step argmax: the best cell for a vector against a
  * broadcast centroid array, by 4-dp-floored cosine with the shared
  * (cosine DESC, lowest-cell-on-tie) discipline (SURVEY.md §2.3 R19, §2.5;
  * reference has no vector ops — driver-mandated extension).
  *
  * `graft_pick_cell(v, nrm, cells)` returns `struct(best: double,
  * cell: bigint)` — the same accumulator the retired higher-order
  * `aggregate` fold (kept as the parity reference in NativeExprSpec)
  * carried: candidates are
  * `coalesce(floor(dot/(nrm·cnrm)·10⁴+0.5)/10⁴, -2)` and a strict `>`
  * over the cell-ascending array keeps the LOWEST cell on ties; an empty
  * or all-degenerate array yields (-2.0, -1). The HOF form pays
  * interpreted-lambda dispatch plus a named_struct allocation per
  * centroid PER ROW — k·dim ≈ 25k multiply-adds each wrapped in lambda
  * machinery; this is two primitive loops inside whole-stage codegen,
  * the same rationale as [[PqEncode]].
  *
  * Arithmetic parity with the fold is exact: the dot accumulates in
  * index order (the [[DotProduct]] order), the guard is `nrm·cnrm > 0`,
  * and the floor lands on `dot / (nrm·cnrm) · 10000 + 0.5` evaluated
  * left-to-right. Degenerate ENTRIES (null struct/field, length-
  * mismatched or null-element centroid, non-positive norm product)
  * score -2 exactly like the fold's coalesce and can therefore never
  * win. Null top-level inputs return null (the graft_dot fail-safe
  * rule; the fold instead returns cell -1 for a null `v` — unreachable
  * from the call sites, which filter to well-formed vectors first).
  *
  * `cells` is validated POSITIONALLY — 3 fields (bigint, array<double>,
  * double) — because the two centroid-array shapes in play name their
  * fields differently ((cell, cv, cnrm) seeds, (cell, rc, rnrm) refined).
  */
case class PickCell(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("best", DoubleType, nullable = false),
    StructField("cell", LongType, nullable = false)))
  override def prettyName: String = "graft_pick_cell"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType,
            ArrayType(StructType(Array(
              StructField(_, LongType, _, _),
              StructField(_, ArrayType(DoubleType, _), _, _),
              StructField(_, DoubleType, _, _))), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "graft_pick_cell expects (array<double>, double, " +
          "array<struct<bigint, array<double>, double>>), got " +
          s"(${a.catalogString}, ${b.catalogString}, ${c.catalogString})")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(vAny: Any, nrmAny: Any, cellsAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val nrm = nrmAny.asInstanceOf[Double]
    val cells = cellsAny.asInstanceOf[ArrayData]
    val nv = v.numElements()
    var best = -2.0
    var cell = -1L
    var k = 0
    val n = cells.numElements()
    while (k < n) {
      if (!cells.isNullAt(k)) {
        val e = cells.getStruct(k, 3)
        if (!e.isNullAt(0) && !e.isNullAt(1) && !e.isNullAt(2)) {
          val cv = e.getArray(1)
          val cnrm = e.getDouble(2)
          var cand = -2.0
          if (cv.numElements() == nv && nrm * cnrm > 0) {
            var acc = 0.0
            var ok = true
            var i = 0
            while (ok && i < nv) {
              if (v.isNullAt(i) || cv.isNullAt(i)) ok = false
              else { acc += v.getDouble(i) * cv.getDouble(i); i += 1 }
            }
            if (ok) cand = math.floor(acc / (nrm * cnrm) * 10000 + 0.5) / 10000.0
          }
          if (cand > best) { best = cand; cell = e.getLong(0) }
        }
      }
      k += 1
    }
    InternalRow(best, cell)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, nrm, cells) => {
      val nv = ctx.freshName("nv")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val e = ctx.freshName("entry")
      val cv = ctx.freshName("cv")
      val cnrm = ctx.freshName("cnrm")
      val cand = ctx.freshName("cand")
      val acc = ctx.freshName("acc")
      val ok = ctx.freshName("ok")
      val best = ctx.freshName("best")
      val cell = ctx.freshName("cell")
      s"""
         |final int $nv = $v.numElements();
         |double $best = -2.0;
         |long $cell = -1L;
         |final int $n = $cells.numElements();
         |for (int $k = 0; $k < $n; $k++) {
         |  if ($cells.isNullAt($k)) continue;
         |  org.apache.spark.sql.catalyst.InternalRow $e = $cells.getStruct($k, 3);
         |  if ($e.isNullAt(0) || $e.isNullAt(1) || $e.isNullAt(2)) continue;
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $e.getArray(1);
         |  double $cnrm = $e.getDouble(2);
         |  double $cand = -2.0;
         |  if ($cv.numElements() == $nv && $nrm * $cnrm > 0) {
         |    double $acc = 0.0;
         |    boolean $ok = true;
         |    for (int $i = 0; $ok && $i < $nv; $i++) {
         |      if ($v.isNullAt($i) || $cv.isNullAt($i)) { $ok = false; }
         |      else { $acc += $v.getDouble($i) * $cv.getDouble($i); }
         |    }
         |    if ($ok) {
         |      $cand = java.lang.Math.floor($acc / ($nrm * $cnrm) * 10000 + 0.5) / 10000.0;
         |    }
         |  }
         |  if ($cand > $best) { $best = $cand; $cell = $e.getLong(0); }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ $best, $cell });
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PickCell =
    copy(first = f, second = s, third = t)
}
