package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension packaging for graft's native expressions: the
  * production wiring (`spark.sql.extensions=graft.plans.GraftExtensions`)
  * that makes graft_minhash / graft_shingles / graft_simhash / graft_dot
  * available in every session of a cluster without imperative registration.
  * `GraftFunctions.register(spark)` stays as the per-session equivalent for
  * library callers.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // window-top-k → native heap TopKPerKey (rule + the strategy that
    // plans the node it produces)
    ext.injectOptimizerRule(_ => TopKRewriteRule)
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(shingles) - 32-element MinHash signature"),
      (exprs: Seq[Expression]) => MinHashSig(exprs.head, 32)))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      info("graft_shingles", "graft_shingles(text, n) - distinct n-word shingles"),
      (exprs: Seq[Expression]) => Shingles(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(tokens) - 64-bit SimHash"),
      (exprs: Seq[Expression]) => SimHashSig(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_union"),
      info("graft_minhash_union", "graft_minhash_union(sig) - group-level MinHash union"),
      (exprs: Seq[Expression]) => MinHashUnionAgg(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of double arrays"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
  }
}
