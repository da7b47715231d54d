package graft

import graft.streaming.{StateBackend, StreamingAggs}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

object StateBackendSpec {
  case class Ev(routing_key: String, ordinal: Long, ts: Timestamp)
  case class REv(routing_key: String, r_ordinal: Long, r_ts: Timestamp)
}

/** T4/T6 at the 100 TB state regime — the stateful operators must run
  * unchanged on the RocksDB state store (state beyond executor heap,
  * changelog checkpointing), producing byte-identical results to the
  * heap-backed default. The provider is a session conf captured at query
  * start, so each test sets it and restores the default in `finally`; the
  * "RocksDB was actually used" proof is the rocksdb custom metrics on the
  * query's state operator (a mis-spelled conf key would silently fall back
  * to the default provider and the results-equal assertion alone would
  * still pass).
  */
class StateBackendSpec extends SparkSpec {
  import spark.implicits._
  import StateBackendSpec._

  private def t(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def rocksMetricKeys(q: org.apache.spark.sql.streaming.StreamingQuery): Set[String] = {
    val p = q.lastProgress
    if (p == null) Set.empty
    else p.stateOperators.flatMap { so =>
      import scala.jdk.CollectionConverters._
      so.customMetrics.keySet().asScala
    }.toSet
  }

  test("stream-stream interval join runs on RocksDB with identical pairs") {
    def runJoin(): (Seq[(Long, Long)], Set[String]) = {
      val l = MemoryStream[Ev](spark)
      val r = MemoryStream[REv](spark)
      val joined = StreamingAggs.correlateStreams(
        l.toDF(), r.toDF(), watermark = "10 minutes", within = "5 minutes")
      val name = s"sb_join_${System.nanoTime()}"
      val q = joined.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        l.addData(Ev("a", 1, t(1)), Ev("b", 2, t(2)), Ev("c", 3, t(10)))
        r.addData(REv("a", 11, t(3)), REv("b", 12, t(9)), REv("c", 13, t(12)))
        q.processAllAvailable()
        l.addData(Ev("z", 99, t(50))) // advance watermark, flush state
        q.processAllAvailable()
        val rows = spark.table(name)
          .select(col("ordinal"), col("r_ordinal")).as[(Long, Long)]
          .collect().toSeq.sorted
        (rows, rocksMetricKeys(q))
      } finally q.stop()
    }

    val (defaultRows, defaultMetrics) = runJoin()
    // REv("b") at 10:09 is outside b's [10:02, 10:07] window; a and c pair.
    assert(defaultRows === Seq((1L, 11L), (3L, 13L)))
    assert(!defaultMetrics.exists(_.toLowerCase.contains("rocksdb")))

    StateBackend.useRocksDB(spark)
    try {
      val (rocksRows, rocksMetrics) = runJoin()
      assert(rocksRows === defaultRows)
      assert(rocksMetrics.exists(_.toLowerCase.contains("rocksdb")),
        s"expected rocksdb state-store metrics, got: $rocksMetrics")
    } finally StateBackend.useDefault(spark)
  }

  test("within-watermark dedup state survives on RocksDB across batches") {
    StateBackend.useRocksDB(spark)
    try {
      val stream = MemoryStream[Ev](spark)
      val out = StreamingAggs.dedupWithinWatermark(stream.toDF(), "ts", "10 minutes")
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("sb_dedup").start()
      try {
        stream.addData(Ev("rk", 1, t(1)), Ev("rk", 2, t(2)))
        q.processAllAvailable()
        stream.addData(Ev("rk", 1, t(3)), Ev("rk", 3, t(4))) // re-delivery dropped
        q.processAllAvailable()
        val ords = spark.table("sb_dedup").select("ordinal").as[Long].collect().sorted
        assert(ords.toSeq === Seq(1L, 2L, 3L))
        assert(rocksMetricKeys(q).exists(_.toLowerCase.contains("rocksdb")))
      } finally q.stop()
    } finally StateBackend.useDefault(spark)
  }
}
