package graft

import graft.streaming.StreamingAggs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** T3 — watermarked event-time operators: tumbling windows finalize once
  * the watermark passes; within-watermark dedup drops re-deliveries.
  */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  private case class Ev(routing_key: String, ordinal: Long, ts: Timestamp)
  private def t(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("R13 streaming: tumbling window counts finalize after watermark passes") {
    val stream = MemoryStream[Ev](spark)
    val out = StreamingAggs.windowedCounts(
      stream.toDF(), "ts", "10 minutes", watermark = "5 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("win_out").start()
    try {
      stream.addData(Ev("rk", 1, t(1)), Ev("rk", 2, t(4)), Ev("rk", 3, t(12)))
      q.processAllAvailable()
      // advance event time far enough to close the 10:00 and 10:10 windows
      stream.addData(Ev("rk", 4, t(40)))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select(col("window.start").cast("string"), col("n")).as[(String, Long)]
        .collect().sortBy(_._1)
      assert(rows.toSeq === Seq(
        ("2024-01-01 10:00:00", 2L),
        ("2024-01-01 10:10:00", 1L)))
    } finally q.stop()
  }

  test("R17 streaming: dropDuplicatesWithinWatermark drops re-delivered ordinals") {
    val stream = MemoryStream[Ev](spark)
    val out = StreamingAggs.dedupWithinWatermark(stream.toDF(), "ts", "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      stream.addData(Ev("rk", 1, t(1)), Ev("rk", 2, t(2)))
      q.processAllAvailable()
      stream.addData(Ev("rk", 1, t(3)), Ev("rk", 3, t(4))) // ordinal 1 re-delivered
      q.processAllAvailable()
      val ords = spark.table("dedup_out").select("ordinal").as[Long].collect().sorted
      assert(ords.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("R14 streaming: session windows close after the inactivity gap + watermark") {
    val stream = MemoryStream[Ev](spark)
    val out = StreamingAggs.sessions(stream.toDF(), "ts", gap = "5 minutes",
      watermark = "5 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // session A: 10:01,10:03 (closes at 10:08); session B: 10:20
      stream.addData(Ev("rk", 1, t(1)), Ev("rk", 2, t(3)), Ev("rk", 3, t(20)))
      q.processAllAvailable()
      stream.addData(Ev("rk", 4, t(50))) // advance watermark past both
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select(col("session_window.start").cast("string"), col("n_events"))
        .as[(String, Long)].collect().sortBy(_._1)
      assert(rows.toSeq === Seq(
        ("2024-01-01 10:01:00", 2L),
        ("2024-01-01 10:20:00", 1L)))
    } finally q.stop()
  }
}
