package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native PQ encode over a 64-dim ARRAY<DOUBLE> vector against a FLAT
  * 1024-entry codebook array laid out `[subspace][code][dim]` (8 × 16 × 8)
  * — returns `array<bigint>[pq_code, mse_units]` (SURVEY.md §2.3 R19,
  * §2.5; reference has no vector ops — driver-mandated extension).
  *
  * The higher-order formulation (per subspace: `aggregate(filter(cb, ...))`
  * over 16 struct entries, each with a `zip_with`+`aggregate` 8-dim
  * distance) allocates intermediate arrays and pays interpreted-lambda
  * dispatch ~128× per row; this expression is three nested primitive
  * loops. Arithmetic parity with the HOF form is exact (NativeExprSpec):
  * the 8 squared diffs accumulate in index order into the same DOUBLE
  * left-fold, `floor(acc * 10000 + 0.5)` lands in integer units, the
  * strict `<` argmin over codes 0..15 ascending keeps the LOWEST code on
  * ties, and the 8 winners pack base-17 exactly like the SQL fold.
  *
  * Null/shape discipline (the graft_dot fail-safe rule): anything but a
  * 64-element vector, a 1024-element codebook, and fully non-null
  * elements returns null — never a plausible-looking code from
  * misaligned reads.
  */
case class PqEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_encode expects (array<double>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = l.asInstanceOf[ArrayData]
    val cb = r.asInstanceOf[ArrayData]
    if (v.numElements() != 64 || cb.numElements() != 1024) return null
    var i = 0
    while (i < 64) { if (v.isNullAt(i)) return null; i += 1 }
    i = 0
    while (i < 1024) { if (cb.isNullAt(i)) return null; i += 1 }
    var pq = 0L
    var mse = 0L
    var p = 1L
    var ss = 0
    while (ss < 8) {
      var bestD = Long.MaxValue
      var bestC = -1
      var code = 0
      while (code < 16) {
        var acc = 0.0
        var d = 0
        while (d < 8) {
          val diff = v.getDouble(ss * 8 + d) - cb.getDouble(ss * 128 + code * 8 + d)
          acc += diff * diff
          d += 1
        }
        val d2u = math.floor(acc * 10000 + 0.5).toLong
        if (d2u < bestD) { bestD = d2u; bestC = code }
        code += 1
      }
      pq += bestC.toLong * p
      mse += bestD
      p *= 17L
      ss += 1
    }
    new GenericArrayData(Array(pq, mse))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => {
      val i = ctx.freshName("i")
      val ss = ctx.freshName("ss")
      val code = ctx.freshName("code")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val d2u = ctx.freshName("d2u")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val pq = ctx.freshName("pq")
      val mse = ctx.freshName("mse")
      val p = ctx.freshName("p")
      val out = ctx.freshName("out")
      s"""
         |if ($v.numElements() != 64 || $cb.numElements() != 1024) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < 64 && !${ev.isNull}; $i++) {
         |    if ($v.isNullAt($i)) { ${ev.isNull} = true; }
         |  }
         |  for (int $i = 0; $i < 1024 && !${ev.isNull}; $i++) {
         |    if ($cb.isNullAt($i)) { ${ev.isNull} = true; }
         |  }
         |  if (!${ev.isNull}) {
         |    long $pq = 0L; long $mse = 0L; long $p = 1L;
         |    for (int $ss = 0; $ss < 8; $ss++) {
         |      long $bestD = Long.MAX_VALUE; int $bestC = -1;
         |      for (int $code = 0; $code < 16; $code++) {
         |        double $acc = 0.0;
         |        for (int $d = 0; $d < 8; $d++) {
         |          double $diff = $v.getDouble($ss * 8 + $d)
         |            - $cb.getDouble($ss * 128 + $code * 8 + $d);
         |          $acc += $diff * $diff;
         |        }
         |        long $d2u = (long) java.lang.Math.floor($acc * 10000 + 0.5);
         |        if ($d2u < $bestD) { $bestD = $d2u; $bestC = $code; }
         |      }
         |      $pq += (long) $bestC * $p;
         |      $mse += $bestD;
         |      $p *= 17L;
         |    }
         |    long[] $out = new long[]{$pq, $mse};
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
    copy(left = l, right = r)
}
