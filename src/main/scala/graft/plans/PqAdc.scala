package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native ADC lookup-sum over a base-17-packed PQ code and a positional
  * 128-entry LUT (SURVEY.md §2.3 R19, §2.5): peel each of the 8 digits
  * with a running integer divide and sum `lut[ss*16 + code]` — the
  * serving inner loop of `v_pq_adc` / `v_ivfpq_search` / `v_ivfpq_batch`
  * and `pqIndexServe`. The higher-order `aggregate(sequence(0,7), ...)`
  * formulation allocates a struct accumulator and pays interpreted-lambda
  * dispatch 8× per (probe, vector) pair; this is one primitive loop in
  * whole-stage codegen (PropertySpec pins exact parity with the SQL fold
  * and with the pack arithmetic ∀ random code vectors and LUTs).
  *
  * Fail-safe discipline (graft_dot rule): a LUT that is not exactly 128
  * non-null entries, a negative packed code, or a digit ≥ 16 (impossible
  * from the encode, whose codes are < 16) returns null — never a
  * plausible-looking sum from misaligned reads.
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc expects (bigint, array<bigint>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lut = r.asInstanceOf[ArrayData]
    if (lut.numElements() != 128) return null
    var p = l.asInstanceOf[Long]
    if (p < 0) return null
    var acc = 0L
    var j = 0
    while (j < 8) {
      val code = (p % 17).toInt
      if (code > 15) return null
      val idx = j * 16 + code
      if (lut.isNullAt(idx)) return null
      acc += lut.getLong(idx)
      p /= 17
      j += 1
    }
    // residue after 8 digits means the input was never a valid 8-digit
    // pack (p >= 17^8, e.g. a raw hash passed by mistake) — its low
    // digits would produce a syntactically valid but wrong sum, exactly
    // the plausible-looking result the contract forbids (code-review r17)
    if (p != 0L) return null
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (code, lut) => {
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val dg = ctx.freshName("dg")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      s"""
         |if ($lut.numElements() != 128 || $code < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $p = $code;
         |  long $acc = 0L;
         |  for (int $j = 0; $j < 8 && !${ev.isNull}; $j++) {
         |    int $dg = (int) ($p % 17L);
         |    int $idx = $j * 16 + $dg;
         |    if ($dg > 15 || $lut.isNullAt($idx)) { ${ev.isNull} = true; }
         |    else { $acc += $lut.getLong($idx); $p /= 17L; }
         |  }
         |  if (!${ev.isNull} && $p != 0L) { ${ev.isNull} = true; }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}
