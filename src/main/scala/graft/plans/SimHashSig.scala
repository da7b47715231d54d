package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Native 64-bit SimHash over a token array (SURVEY.md §2.3 R18, §2.5).
  *
  * The HOF formulation (aggregate over bits 0..63, each re-aggregating the
  * token array) hashes every token 64 times through interpreted lambdas —
  * O(64·n) string hashes per row. This expression hashes each token ONCE
  * and updates all 64 bit counters in the same pass: bit i of the result is
  * set iff the count of tokens whose hash has bit i set exceeds half the
  * token count (the ±1 majority vote, identical semantics to the HOF form).
  */
case class SimHashSig(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  // analysis-time type check (code-review r17): an array<bigint>
  // argument would reach getUTF8String and reinterpret long slots as
  // offset+length pairs — silently wrong signatures, not an error
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_simhash expects array<string> tokens, got ${t.catalogString}")
    }

  // may yield null on a null ELEMENT (the fail-safe rule) even when the
  // array column itself is non-null
  override def nullable: Boolean = true

  /** Public twin of nullSafeEval for generated code — called through a
    * reference object so the enclosing WholeStageCodegen stage stays
    * fused (a CodegenFallback splits it for every co-resident expression).
    * Boxed: null (a null token element) maps back to SQL NULL.
    */
  def compute(v: ArrayData): java.lang.Long =
    nullSafeEval(v).asInstanceOf[java.lang.Long]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHashSig].getName)
    val tmp = ctx.freshName("simhashBoxed")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |java.lang.Long $tmp = $ref.compute($c);
         |${ev.isNull} = ($tmp == null);
         |if (!${ev.isNull}) { ${ev.value} = $tmp.longValue(); }
       """.stripMargin)
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      // a null token nulls the signature (the DotProduct fail-safe rule)
      if (arr.isNullAt(i)) return null
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) != 0L) counts(j) += 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      // majority vote: sum of (+1 for set bit, -1 for clear) > 0  ⇔  2·count > n
      if (2 * counts(j) > n) sig |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(c: Expression): SimHashSig = copy(child = c)
}
