package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
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
  * intersection and union from the single count. Nothing is materialized.
  *
  * Preconditions match the SQL form it replaces: inputs are
  * distinct-element arrays (shingles / array_distinct output). Both-empty
  * returns 0.0, like the SQL form's `union = 0` guard.
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

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

  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}
