package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (QueryProbe's streaming twin): run the bench's two streaming
  * measurements N times in one JVM to separate cold-start from steady-state
  * and to A/B the state-store backend — single bench figures for the stream
  * metrics carry the same 2-3× first-run multiplier the batch queries do.
  * Usage: runMain graft.StreamProbe <sfDir> <pipeline|join> [runs] [backend]
  *   backend: default | rocksdb
  *
  * `state` mode (VERDICT r14 #4 — observe the heap→RocksDB crossover
  * instead of extrapolating it): drive a per-key stateful aggregation
  * with BATCHES of entirely fresh synthetic keys, so total state grows by
  * `keysPerBatch` per micro-batch while per-batch input work stays
  * constant — any per-batch time growth is the state store's marginal
  * cost at that state size (snapshot/maintenance on heap, compaction on
  * RocksDB), not query work. Prints one line per batch; run once per
  * backend and read the divergence point.
  * Usage: runMain graft.StreamProbe <sfDir> state [nBatches] [backend] [keysPerBatch]
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
    if (which == "state") {
      stateGrowth(spark, nBatches = runs, backend = backend,
        keysPerBatch = if (args.length > 4) args(4).toInt else 500000)
      spark.stop()
      return
    }
    if (which == "corpus") {
      corpusBench(spark, d, runs)
      spark.stop()
      return
    }
    try Tables.events(spark, d).count() catch { case _: Throwable => () }
    for (i <- 1 to runs) {
      val (rows, secs) =
        if (which == "pipeline") Bench.streamPipelineBench(spark, d)
        else Bench.streamJoinBench(spark, d)
      println(f"$which[$backend] run $i: $rows rows in $secs%.2f s = ${rows / secs}%.0f rows/s")
    }
    spark.stop()
  }

  /** `corpus` mode (r17): price the composed streaming corpus pipeline —
    * the sf documents table through [[graft.streaming.StreamingAggs
    * .startCorpusPipeline]] in ~5 micro-batches, once with the
    * boilerplate line scrub OFF and once ON, so the scrub's marginal
    * per-doc cost is a measured figure (BASELINE.md), not a guess.
    * Usage: runMain graft.StreamProbe <sfDir> corpus [runs]
    */
  private def corpusBench(spark: SparkSession, d: String, runs: Int): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val evalDocs = Seq("benchmark holdout grams live only here").toDF("text")
    val slice = math.max(docs.length / 5, 1)
    for (scrub <- Seq(false, true); i <- 1 to runs) {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-corpusprobe").toString
      val ms = MemoryStream[(Long, String)]
      val q = graft.streaming.StreamingAggs.startCorpusPipeline(
        ms.toDF().toDF("doc_id", "text"), evalDocs,
        s"$dir/state", s"$dir/ckpt", _ => (), lineScrub = scrub)
      val t0 = System.nanoTime()
      try docs.grouped(slice).foreach { g =>
        ms.addData(g.toSeq: _*); q.processAllAvailable()
      } finally q.stop()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"corpus[lineScrub=$scrub] run $i: ${docs.length} docs " +
        f"in $s%.2f s = ${docs.length / s}%.0f docs/s")
    }
  }

  /** Grow keyed-aggregation state by `keysPerBatch` FRESH keys per batch
    * for `nBatches` batches (default 3 from the shared [runs] arg — pass
    * 16+ for the crossover study: 16 × 500k = 8M keys ≈ 1M/partition at
    * 8 shuffle partitions) and print the per-batch wall time trajectory.
    */
  private def stateGrowth(spark: SparkSession, nBatches: Int,
                          backend: String, keysPerBatch: Int): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, count, lit}
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"graft-stateprobe-$backend").toString
    val ms = MemoryStream[Long]
    val q = ms.toDF().toDF("k")
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .writeStream.format("noop").outputMode("update")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      var next = 0L
      for (b <- 1 to nBatches) {
        val t0 = System.nanoTime()
        ms.addData(next until (next + keysPerBatch): _*)
        next += keysPerBatch
        q.processAllAvailable()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"state[$backend] batch $b%2d: totalKeys=$next%,d " +
          f"$s%6.2f s  ${keysPerBatch / s}%,.0f keys/s")
      }
    } finally q.stop()
  }
}
