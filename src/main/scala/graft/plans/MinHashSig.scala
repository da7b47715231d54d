package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native MinHash signature expression (SURVEY.md §2.3 R18, §2.5).
  *
  * The higher-order-function formulation
  * `transform(sequence(0,k-1), s -> array_min(transform(sh, x -> xxhash64(x, s))))`
  * re-hashes every shingle STRING k times through interpreted lambda calls —
  * ~80 s on 5k docs. This expression does one xxhash64 pass over the
  * shingles and derives the k permutations with the standard multiply-add
  * trick (h_j = a_j·h + b_j over Z/2^64, a_j odd ⇒ a bijection, so each
  * (a_j, b_j) induces an independent min-wise permutation of hash space):
  * O(|sh|·k) integer ops, no per-seed string hashing. ~1000× less work,
  * same LSH banding downstream.
  *
  * Single-pass scalar expression ⇒ embarrassingly parallel at 100 TB.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  // deterministic permutation parameters (seed fixed for reproducibility)
  @transient private lazy val perms: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(0x6772616674L) // "graft"
    Array.fill(k)(((rnd.nextLong() | 1L), rnd.nextLong()))
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var j = 0
      while (j < k) {
        val p = perms(j)
        val hj = p._1 * h + p._2
        if (hj < mins(j)) mins(j) = hj
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** Session registration for graft's native expressions — callable from SQL
  * and from expr("...") column code. Idempotent per session.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", exprs => MinHashSig(exprs.head, 32), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles",
      exprs => Shingles(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue()),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", exprs => SimHashSig(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_union", exprs => MinHashUnionAgg(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs.head, exprs(1)), "scala_udf")
  }
}
