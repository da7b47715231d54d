package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (PlanProbe's timing twin): run one registered query N times at
  * bench settings to separate cold-scan cost from steady-state cost —
  * bench totals at sf0.1 local[32] are machine-noise dominated, so
  * regressions should be confirmed here in isolation before chasing them.
  * Usage: runMain graft.QueryProbe <sfDir> <queryName> [runs]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.TopKRewrite.enable(spark)
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = if (args.length > 1) args(1) else "q1_agg"
    val runs = if (args.length > 2) args(2).toInt else 3
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).count()
      println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
