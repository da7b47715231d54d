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
class StreamStaticSpec extends SparkSpec {
  import spark.implicits._

  private case class Msg(body: String, ordinal: Long, ts_ms: Long, routing_key: String)

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
}
