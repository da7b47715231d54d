package graft

import graft.streaming.{EventStreamPipeline, StreamCoordinator}
import graft.operators.Replay
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

/** Source coverage (SURVEY.md §2.1 S1/S10): multi-format batch round-trips
  * and a file-based streaming source feeding the event pipeline.
  */
// companion-object case class: nested-in-class case classes capture an
// outer instance and break typed-encoder codegen (janino fallback storm)
object SourcesSpec {
  case class EnvMsg(body: String, ordinal: Long, ts_ms: Long)
}

class SourcesSpec extends SparkSpec {
  import spark.implicits._
  import SourcesSpec.EnvMsg

  private lazy val tmp = Files.createTempDirectory("graft-sources").toString

  test("S10: csv/json/parquet round-trip the events subset identically") {
    val src = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"event_type", $"value")
      .limit(100)
    for (fmt <- Seq("parquet", "json", "csv")) {
      val path = s"$tmp/events_$fmt"
      val w = src.write.mode("overwrite")
      (if (fmt == "csv") w.option("header", "true") else w).format(fmt).save(path)
      val r = spark.read
      val back = fmt match {
        case "csv" => r.option("header", "true").schema(src.schema).csv(path)
        case "json" => r.schema(src.schema).json(path)
        case _ => r.parquet(path)
      }
      assert(back.count() === 100, fmt)
      val sums = back.agg(
        sum($"event_id").as[Long], floor(sum($"value") * 100 + 0.5).as[Long]).head()
      val expect = src.agg(
        sum($"event_id").as[Long], floor(sum($"value") * 100 + 0.5).as[Long]).head()
      assert(sums === expect, fmt)
    }
  }

  test("S1: file-based streaming source drives the event pipeline") {
    // stage a file log with envelope columns
    val logDir = s"$tmp/stream_log"
    Tables.events(spark, "/root/testdata/sf0.001")
      .filter($"event_id" < 50)
      .select($"props".as("body"), $"event_id".as("ordinal"),
        unix_millis($"ts").as("ts_ms"))
      .coalesce(1).write.mode("overwrite").parquet(logDir)

    val schema = StructType(Seq(
      StructField("body", StringType), StructField("ordinal", LongType),
      StructField("ts_ms", LongType)))
    val stream = spark.readStream.schema(schema).parquet(logDir)

    val sent = new ConcurrentLinkedQueue[String]()
    val coord = new StreamCoordinator
    val q = EventStreamPipeline.start(
      spark, stream, "file-log", Replay.FromOrdinal(40), coord, sent.add(_))
    try {
      q.processAllAvailable()
      val out = sent.toArray(new Array[String](0)).toSeq
      assert(out.size === 10, s"got ${out.size}: ${out.map(_.take(30)).mkString(" / ")}") // ordinals 40..49
      assert(out.head.contains("\"ess_ordinal\": 40"))
      // observe() metrics: received counts pre-filter rows, sent post-filter
      val stats = q.lastProgress.observedMetrics.get("ess_stats")
      assert(stats.getAs[Long]("received") === 10L)
      assert(stats.getAs[Long]("sent") === 10L)
    } finally coord.release("file-log")
  }

  test("T2: checkpointed restart resumes from committed offsets, no re-delivery") {
    val logDir = s"$tmp/restart_log"
    val ckpt = s"$tmp/restart_ckpt"
    def stage(lo: Int, hi: Int): Unit =
      Tables.events(spark, "/root/testdata/sf0.001")
        .filter($"event_id" >= lo && $"event_id" < hi)
        .select($"props".as("body"), $"event_id".as("ordinal"),
          unix_millis($"ts").as("ts_ms"))
        .coalesce(1).write.mode("append").parquet(logDir)

    val schema = StructType(Seq(
      StructField("body", StringType), StructField("ordinal", LongType),
      StructField("ts_ms", LongType)))
    def consume(): Seq[String] = {
      val sent = new ConcurrentLinkedQueue[String]()
      val coord = new StreamCoordinator
      val stream = spark.readStream.schema(schema).parquet(logDir)
      val q = EventStreamPipeline.start(
        spark, stream, "restart-log", Replay.FromOrdinal(0), coord, sent.add(_),
        checkpointDir = Some(ckpt))
      try { q.processAllAvailable() } finally coord.release("restart-log")
      sent.toArray(new Array[String](0)).toSeq
    }

    stage(0, 5)
    val first = consume()
    assert(first.size === 5)
    stage(5, 8) // new data arrives while consumer is down
    val second = consume()
    assert(second.size === 3, s"re-delivery after restart: $second")
    assert(second.head.contains("\"ess_ordinal\": 5"))
  }

  test("T6: maxFilesPerTrigger bounds batches; order preserved across batches") {
    val logDir = s"$tmp/bp_log"
    def stage(lo: Int, hi: Int): Unit =
      Tables.events(spark, "/root/testdata/sf0.001")
        .filter($"event_id" >= lo && $"event_id" < hi)
        .select($"props".as("body"), $"event_id".as("ordinal"),
          unix_millis($"ts").as("ts_ms"))
        .coalesce(1).write.mode("append").parquet(logDir)
    stage(0, 10); stage(10, 20); stage(20, 30)

    val schema = StructType(Seq(
      StructField("body", StringType), StructField("ordinal", LongType),
      StructField("ts_ms", LongType)))
    val sent = new ConcurrentLinkedQueue[String]()
    val coord = new StreamCoordinator
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(logDir)
    val q = EventStreamPipeline.start(
      spark, stream, "bp-log", Replay.FromOrdinal(0), coord, sent.add(_))
    try {
      q.processAllAvailable()
      assert(q.recentProgress.count(_.numInputRows > 0) >= 3) // one file per micro-batch
      val ords = sent.toArray(new Array[String](0)).toSeq
        .map(w => w.split("\"ess_ordinal\": ")(1).takeWhile(_.isDigit).toLong)
      assert(ords.size === 30)
      assert(ords === ords.sorted, "order broken across micro-batches")
    } finally coord.release("bp-log")
  }

  test("T1: independent streams deliver concurrently without interference") {
    val sentA = new ConcurrentLinkedQueue[String]()
    val sentB = new ConcurrentLinkedQueue[String]()
    val coord = new StreamCoordinator
    val sa = MemoryStream[EnvMsg](spark)
    val sb = MemoryStream[EnvMsg](spark)
    val qa = EventStreamPipeline.start(spark, sa.toDF(), "multi-a", Replay.FromOrdinal(0), coord, sentA.add(_))
    val qb = EventStreamPipeline.start(spark, sb.toDF(), "multi-b", Replay.FromOrdinal(0), coord, sentB.add(_))
    try {
      sa.addData(EnvMsg("a1|x", 1, 10), EnvMsg("a2|x", 2, 20))
      sb.addData(EnvMsg("b1|x", 1, 10))
      qa.processAllAvailable(); qb.processAllAvailable()
      assert(sentA.size === 2 && sentB.size === 1)
      assert(coord.activeQuery("multi-a").contains(qa))
      assert(coord.activeQuery("multi-b").contains(qb))
    } finally { coord.release("multi-a"); coord.release("multi-b") }
  }
}
