package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native exact Jaccard similarity of two distinct-element string arrays
  * (SURVEY.md §2.3 R18, §2.5).
  *
  * The SQL formulation (`size(array_intersect(a,b)) / (size(a)+size(b) -
  * size(array_intersect(a,b)))`) evaluates `array_intersect` TWICE and
  * materializes the intersection array both times — on the near-dup verify
  * path that is hundreds of thousands of candidate pairs, each hashing two
  * ~100-element shingle arrays twice over. This expression makes ONE pass:
  * hash-set the smaller side, count hits from the larger, and derive both
  * intersection and union from the single count. Nothing is materialized,
  * and doGenCode keeps the verify loop inside whole-stage codegen (the
  * CodegenFallback form paid a virtual call + boxing per candidate pair).
  *
  * Preconditions match the SQL form it replaces: inputs are
  * distinct-element arrays (shingles / array_distinct output). Both-empty
  * returns 0.0, like the SQL form's `union = 0` guard.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  // Analysis-time type check keeps the SQL-registered form safe: anything
  // but ARRAY<STRING> inputs is an analysis error, never a cast surprise.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_jaccard expects (array<string>, array<string>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return 0.0 // empty side: intersection 0; 0/u or the 0-union guard
    val (small, big, ns, nbig) = if (na <= nb) (a, b, na, nb) else (b, a, nb, na)
    val set = new java.util.HashSet[UTF8String](ns * 2)
    var i = 0
    while (i < ns) { set.add(small.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nbig) {
      if (set.contains(big.getUTF8String(i))) inter += 1
      i += 1
    }
    java.lang.Double.valueOf(inter.toDouble / (na + nb - inter))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val small = ctx.freshName("small")
      val big = ctx.freshName("big")
      val ns = ctx.freshName("ns")
      val nbig = ctx.freshName("nbig")
      val set = ctx.freshName("set")
      val inter = ctx.freshName("inter")
      val i = ctx.freshName("i")
      val arrayData = classOf[ArrayData].getName
      s"""
         |final int $na = $a.numElements();
         |final int $nb = $b.numElements();
         |if ($na == 0 || $nb == 0) {
         |  ${ev.value} = 0.0;
         |} else {
         |  final $arrayData $small = ($na <= $nb) ? $a : $b;
         |  final $arrayData $big = ($na <= $nb) ? $b : $a;
         |  final int $ns = $small.numElements();
         |  final int $nbig = $big.numElements();
         |  final java.util.HashSet $set = new java.util.HashSet($ns * 2);
         |  for (int $i = 0; $i < $ns; $i++) { $set.add($small.getUTF8String($i)); }
         |  int $inter = 0;
         |  for (int $i = 0; $i < $nbig; $i++) {
         |    if ($set.contains($big.getUTF8String($i))) { $inter++; }
         |  }
         |  ${ev.value} = (double) $inter / ($na + $nb - $inter);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}
