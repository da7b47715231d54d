package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r21): one-line plan-shape summary for EVERY registered query —
  * join strategies, exchange count, cartesians — so a suite-wide audit is
  * one run instead of 202 PlanProbe invocations.
  * Usage: runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.TopKRewrite.enable(spark)
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, d).queryExecution.executedPlan.toString
        def c(s: String) = s.r.findAllIn(p).size
        println(s"AUDIT $name exch=${c("Exchange")} smj=${c("SortMergeJoin")} " +
          s"bhj=${c("BroadcastHashJoin")} bnl=${c("BroadcastNestedLoopJoin")} " +
          s"cart=${c("CartesianProduct")} sort=${c("(?m)^\\s*[+:]?-? ?\\*?\\(?\\d*\\)? ?Sort ")} " +
          s"window=${c("Window")} rdd=${c("ExistingRDD")}")
      } catch {
        case e: Throwable => println(s"AUDIT $name ERROR ${e.getClass.getSimpleName}")
      }
    }
    spark.stop()
  }
}
