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
    // the function list is GraftFunctions.builders — one source of truth
    // shared with the per-session registration path
    GraftFunctions.builders.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
  }
}
