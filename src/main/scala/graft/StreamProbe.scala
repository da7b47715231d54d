package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (QueryProbe's streaming twin): run the bench's two streaming
  * measurements N times in one JVM to separate cold-start from steady-state
  * and to A/B the state-store backend — single bench figures for the stream
  * metrics carry the same 2-3× first-run multiplier the batch queries do.
  * Usage: runMain graft.StreamProbe <sfDir> <pipeline|join> [runs] [backend]
  *   backend: default | rocksdb
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1) else "join"
    val runs = if (args.length > 2) args(2).toInt else 3
    val backend = if (args.length > 3) args(3) else "default"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (backend == "rocksdb") graft.streaming.StateBackend.useRocksDB(spark)
    try Tables.events(spark, d).count() catch { case _: Throwable => () }
    for (i <- 1 to runs) {
      val (rows, secs) =
        if (which == "pipeline") Bench.streamPipelineBench(spark, d)
        else Bench.streamJoinBench(spark, d)
      println(f"$which[$backend] run $i: $rows rows in $secs%.2f s = ${rows / secs}%.0f rows/s")
    }
    spark.stop()
  }
}
