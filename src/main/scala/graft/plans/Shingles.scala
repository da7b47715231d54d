package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct n-word shingling (SURVEY.md §2.3 R18, §2.5).
  *
  * The SQL formulation (CASE + split ×3 + transform + slice + concat_ws +
  * array_distinct) evaluates interpreted lambdas per token and re-splits the
  * text several times; this expression makes one pass: split once, build
  * each n-gram with a string builder, dedupe with a hash set (first-
  * occurrence order, matching array_distinct). Returns an empty array for
  * docs shorter than n tokens, like the SQL form.
  */
case class Shingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  // analysis-time type check (code-review r17): a non-string argument
  // would otherwise reach executors as a ClassCastException at runtime
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_shingles expects a string, got ${t.catalogString}")
    }

  /** Public twin of nullSafeEval for generated code: the body is
    * set/StringBuilder work with nothing to gain from inlining, so the
    * generated code calls back into THIS expression (shipped as a
    * reference object) instead of falling back to interpreted eval — a
    * CodegenFallback would split the enclosing WholeStageCodegen stage
    * and cost every co-resident expression its fusion, not just this one.
    */
  def compute(v: UTF8String): GenericArrayData =
    nullSafeEval(v).asInstanceOf[GenericArrayData]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingles", this, classOf[Shingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def nullSafeEval(v: Any): Any = {
    // limit -1 keeps trailing empty tokens, matching Spark SQL's
    // split(text, ' ') and DuckDB string_split — String.split(' ') drops
    // them and would silently diverge from the SQL/oracle formulation on
    // trailing whitespace
    val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Shingles = copy(child = c)
}
