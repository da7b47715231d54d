package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool (r21): per-stage breakdown of one registered query at bench
  * settings — prints each completed stage's wall duration, summed executor
  * run time, task count and shuffle bytes, so "where do the seconds go"
  * has a measured answer instead of a guess. Runs the query `runs` times
  * (first run warms scans/codegen; stages are printed for the LAST run).
  * Usage: runMain graft.StageProbe <sfDir> <query> [runs]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val b0 = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // match Bench's AQE coalesce floor default (see Bench.scala)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "1m"))
      .config("spark.ui.enabled", "false")
    // optional conf overrides: GRAFT_CONF="k=v;k2=v2" (env — sbt forks
    // the run JVM, so -D on the sbt command line never arrives here)
    val b = sys.env.get("GRAFT_CONF").filter(_.nonEmpty)
      .map(_.split(';').filter(_.contains("=")))
      .getOrElse(Array.empty[String])
      .foldLeft(b0) { (bb, kv) =>
        val Array(k, v) = kv.split("=", 2); bb.config(k, v)
      }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.TopKRewrite.enable(spark)
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = if (args.length > 1) args(1) else "q1_agg"
    val runs = if (args.length > 2) args(2).toInt else 2
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    var record = false
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        if (record) {
          val si = sc.stageInfo
          val tm = si.taskMetrics
          val dur = (for {s <- si.submissionTime; c <- si.completionTime}
            yield (c - s) / 1000.0).getOrElse(-1.0)
          rows.add(f"stage ${si.stageId}%4d dur=$dur%6.2fs exec=${tm.executorRunTime / 1000.0}%7.2fs " +
            f"tasks=${si.numTasks}%4d shufR=${tm.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
            f"shufW=${tm.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB  ${si.name.takeWhile(_ != '\n').take(80)}")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    for (i <- 1 to runs) {
      record = i == runs
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).count()
      println(f"$name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
    rows.forEach(r => println(r))
  }
}
