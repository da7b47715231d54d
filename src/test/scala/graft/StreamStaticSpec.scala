package graft

import graft.operators.Replay
import graft.streaming.{EventStreamPipeline, StreamCoordinator}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.util.concurrent.ConcurrentLinkedQueue

/** Stream-static join: the registry-enrichment pattern — a streaming
  * envelope joined to a static (broadcastable) dimension before delivery.
  * At scale the static side broadcasts; the stream never shuffles.
  */
// companion-object case class: nested-in-class case classes capture an
// outer instance and break typed-encoder codegen (janino fallback storm)
object StreamStaticSpec {
  case class Msg(body: String, ordinal: Long, ts_ms: Long, routing_key: String)
}

class StreamStaticSpec extends SparkSpec {
  import spark.implicits._
  import StreamStaticSpec.Msg

  test("stream-static join enriches stream rows from the broadcast registry") {
    val registry = Seq(("account.events", 1L, "ws://h/es/a"), ("dm.events", 2L, "ws://h/es/b"))
      .toDF("routing_key", "es_id", "location")
    val stream = MemoryStream[Msg](spark)
    val joined = stream.toDF()
      .join(broadcast(registry), Seq("routing_key"), "inner")
      .withColumn("body", concat(col("body"), lit("|es_id: "), col("es_id")))
    val sent = new ConcurrentLinkedQueue[String]()
    val coord = new StreamCoordinator
    val q = EventStreamPipeline.start(
      spark, joined, "ss-join", Replay.FromOrdinal(0), coord, sent.add(_))
    try {
      stream.addData(
        Msg("m1|x", 1, 10, "account.events"),
        Msg("m2|x", 2, 20, "dm.events"),
        Msg("m3|x", 3, 30, "unknown.key")) // unregistered stream: dropped by join
      q.processAllAvailable()
      val out = sent.toArray(new Array[String](0)).toSeq
      assert(out === Seq(
        "m1|x|es_id: 1|ordinal: 1|timestamp: 10",
        "m2|x|es_id: 2|ordinal: 2|timestamp: 20"))
    } finally coord.release("ss-join")
  }

  test("stream-stream join: two watermarked streams pair within the time bound") {
    import org.apache.spark.sql.streaming.OutputMode
    // views ⋈ purchases per user within 10 minutes — the funnel-attribution
    // shape; both sides watermarked so join state is bounded (T3/T4)
    val views = MemoryStream[(Long, java.sql.Timestamp)](spark)
    val purchases = MemoryStream[(Long, java.sql.Timestamp)](spark)
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val v = views.toDF().toDF("user_id", "v_ts").withWatermark("v_ts", "10 minutes")
    val p = purchases.toDF().toDF("p_user", "p_ts").withWatermark("p_ts", "10 minutes")
    val joined = v.join(p,
      expr("""user_id = p_user AND p_ts BETWEEN v_ts AND v_ts + INTERVAL 10 minutes"""))
    val q = joined.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ss_funnel").start()
    try {
      views.addData((1L, ts(100)), (2L, ts(100)))
      purchases.addData((1L, ts(400)))   // within 10 min of user 1's view
      purchases.addData((2L, ts(5000)))  // outside the window for user 2
      q.processAllAvailable()
      val rows = spark.table("ss_funnel")
        .selectExpr("user_id", "cast(v_ts as long)", "cast(p_ts as long)")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(rows === Seq((1L, 100L, 400L)))
    } finally q.stop()
  }
}
