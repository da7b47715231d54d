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
      // match Bench's AQE coalesce floor default (see Bench.scala)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "1m"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.TopKRewrite.enable(spark)
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    // comma-separated names probe a batch in ONE session (r21): per-JVM
    // spin-up dwarfs a sub-2 s query, so steady-stating the top-N one
    // JVM at a time was mostly measuring sbt+session start
    val names = (if (args.length > 1) args(1) else "q1_agg").split(',').toSeq
    val runs = if (args.length > 2) args(2).toInt else 3
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (name <- names) {
      val ts = (1 to runs).map { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, d).count()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"$name run $i: $s%.2f s")
        s
      }
      println(f"$name steady: min=${ts.min}%.2f median=${ts.sorted.apply(ts.size / 2)}%.2f")
    }
    spark.stop()
  }
}
