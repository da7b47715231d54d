package graft

import graft.streaming.StreamingAggs
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Event case classes live in the companion OBJECT, not the spec class:
  * a case class nested in a class captures an outer instance, which
  * Spark's typed-encoder codegen cannot instantiate — every encoder use
  * then logs a janino CompileException and silently falls back to
  * interpreted mode, so the specs would exercise the interpreted paths
  * (VERDICT r10 §wrong-2).
  */
object WatermarkSpec {
  case class Ev(routing_key: String, ordinal: Long, ts: Timestamp)
  case class REv(routing_key: String, r_ordinal: Long, r_ts: Timestamp)
  case class VEv(ts: Timestamp, value: Double)
  case class EEv(ts: Timestamp, v: Seq[Double])
}

/** T3 — watermarked event-time operators: tumbling windows finalize once
  * the watermark passes; within-watermark dedup drops re-deliveries.
  */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._
  import WatermarkSpec._

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

  test("T3/R7 streaming: windowed PSI — stationary window quiet, shifted window alarms") {
    // streaming twin of q_psi_drift: reference = uniform shares over
    // [0, 10). Window 1 receives a uniform spread (one value per bucket
    // -> smoothed p ≡ q -> PSI 0); window 2 receives all mass in bucket 0
    // (maximal shift -> PSI far above the 0.25 alarm).
    val stream = MemoryStream[VEv](spark)
    val out = StreamingAggs.psiDriftWindows(stream.toDF(), "ts", "value",
      ref = Seq.fill(10)(0.1), lo = 0.0, hi = 10.0,
      window_ = "10 minutes", watermark = "5 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("psi_out").start()
    try {
      stream.addData((0 until 10).map(i => VEv(t(1), i + 0.5)): _*)   // 10:00 window, uniform
      stream.addData((0 until 10).map(_ => VEv(t(12), 0.5)): _*)      // 10:10 window, all bucket 0
      q.processAllAvailable()
      stream.addData(VEv(t(40), 5.0)) // advance watermark: close both
      q.processAllAvailable()
      val rows = spark.table("psi_out")
        .select(col("window.start").cast("string"), col("n_values"),
          col("psi"), col("drift_alarm"))
        .collect().sortBy(_.getString(0))
      assert(rows.length === 2, rows.mkString(";"))
      val quiet = rows(0)
      assert(quiet.getLong(1) === 10L)
      assert(quiet.getDouble(2) === 0.0,
        s"uniform window vs uniform ref must smooth to PSI 0: ${quiet.getDouble(2)}")
      assert(!quiet.getBoolean(3))
      val drifted = rows(1)
      assert(drifted.getLong(1) === 10L)
      assert(drifted.getDouble(2) > 0.25, s"shifted window must alarm: ${drifted.getDouble(2)}")
      assert(drifted.getBoolean(3))
    } finally q.stop()
  }

  test("R19/T3 streaming: embedding-drift windows alarm when the centroid leaves the CLT null") {
    // streaming twin of v_embedding_drift: reference centroid
    // (0.25, 0.25, 0.25, 0.25) over dim 4 (units 250000 each, n_ref 100).
    // Window 1 cycles the four axis vectors 4x -> window centroid equals
    // the reference exactly (shift 0); window 2 collapses onto axis 0 ->
    // shift = sqrt(750000^2 + 3*250000^2) = 866025 units, above the
    // 3-sigma limit 3*sqrt(1/100 + 1/16)*1e6 = 807773.
    def axis(i: Int): Seq[Double] = Seq.tabulate(4)(j => if (j == i) 1.0 else 0.0)
    val stream = MemoryStream[EEv](spark)
    val out = StreamingAggs.embeddingDriftWindows(stream.toDF(), "ts", "v",
      refMeansU = Seq.fill(4)(250000L), refN = 100L, dim = 4,
      window_ = "10 minutes", watermark = "5 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("edrift_out").start()
    try {
      stream.addData((0 until 16).map(i => EEv(t(1), axis(i % 4))): _*)
      stream.addData((0 until 16).map(_ => EEv(t(12), axis(0))): _*)
      q.processAllAvailable()
      stream.addData(EEv(t(40), axis(1))) // advance watermark: close both
      q.processAllAvailable()
      val rows = spark.table("edrift_out")
        .select(col("window.start").cast("string"), col("n_vectors"),
          col("mean_shift_u6"), col("shift_limit_u6"), col("drifted"))
        .collect().sortBy(_.getString(0))
      assert(rows.length === 2, rows.mkString(";"))
      val calm = rows(0)
      assert(calm.getLong(1) === 16L && calm.getLong(2) === 0L)
      assert(!calm.getBoolean(4), s"on-reference window must stay calm: $calm")
      val hot = rows(1)
      assert(hot.getLong(1) === 16L)
      assert(hot.getLong(2) === 866025L, s"collapsed centroid shift: $hot")
      assert(hot.getLong(2) > hot.getLong(3) && hot.getBoolean(4),
        s"collapsed window must alarm: $hot")
    } finally q.stop()
  }

  test("R13 streaming: hopping windows — each event counted in window/slide overlapping windows") {
    val stream = MemoryStream[Ev](spark)
    val out = StreamingAggs.windowedCounts(
      stream.toDF(), "ts", "10 minutes", watermark = "5 minutes",
      slide = Some("5 minutes"))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("hop_out").start()
    try {
      stream.addData(Ev("rk", 1, t(1)), Ev("rk", 2, t(4)), Ev("rk", 3, t(12)))
      q.processAllAvailable()
      stream.addData(Ev("rk", 4, t(40))) // advance watermark past all hops
      q.processAllAvailable()
      val rows = spark.table("hop_out")
        .select(col("window.start").cast("string"), col("n")).as[(String, Long)]
        .collect().sortBy(_._1)
      // 10:01 and 10:04 land in [09:55,10:05) and [10:00,10:10);
      // 10:12 lands in [10:05,10:15) and [10:10,10:20)
      assert(rows.toSeq === Seq(
        ("2024-01-01 09:55:00", 2L),
        ("2024-01-01 10:00:00", 2L),
        ("2024-01-01 10:05:00", 1L),
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

  test("T3/R4 streaming: stream-stream interval join converges on out-of-order arrivals") {
    val lhs = MemoryStream[Ev](spark)
    val rhs = MemoryStream[REv](spark)
    val out = StreamingAggs.correlateStreams(lhs.toDF(), rhs.toDF(),
      watermark = "5 minutes", within = "5 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("corr_out").start()
    try {
      // left arrives FIRST, matching right only in a later micro-batch —
      // the buffered left row must still pair up (out-of-order converges)
      lhs.addData(Ev("rk", 1, t(1)), Ev("rk", 2, t(20)))
      q.processAllAvailable()
      rhs.addData(REv("rk", 101, t(3)), // within 5 min of ordinal 1 only
        REv("other", 102, t(3)))        // key mismatch: never pairs
      q.processAllAvailable()
      val pairs = spark.table("corr_out")
        .select(col("ordinal"), col("r_ordinal")).as[(Long, Long)]
        .collect().sorted
      assert(pairs.toSeq === Seq((1L, 101L)))
    } finally q.stop()
  }

  test("T3/R4 streaming: left-outer emits unmatched rows only after the watermark closes them") {
    val lhs = MemoryStream[Ev](spark)
    val rhs = MemoryStream[REv](spark)
    val out = StreamingAggs.correlateStreams(lhs.toDF(), rhs.toDF(),
      watermark = "5 minutes", within = "5 minutes", joinType = "left_outer")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("corr_outer_out").start()
    try {
      lhs.addData(Ev("rk", 1, t(1)), Ev("rk", 2, t(10)))
      rhs.addData(REv("rk", 101, t(2)))
      q.processAllAvailable()
      // ordinal 2 is unmatched but must NOT surface yet: a right row at
      // ts ≤ 10:15 could still arrive inside the watermark horizon
      val early = spark.table("corr_outer_out")
        .select(col("ordinal")).as[Long].collect()
      assert(early.toSeq === Seq(1L))
      // advance BOTH watermarks far past 10:15 — the null-extended row
      // must now finalize (state provably cannot match anymore)
      lhs.addData(Ev("rk", 9, t(50)))
      rhs.addData(REv("rk", 999, t(50)))
      q.processAllAvailable()
      val rows = spark.table("corr_outer_out")
        .select(col("ordinal"), col("r_ordinal"))
        .as[(Long, Option[Long])].collect().sortBy(_._1)
      // the advance pair (9, 999) matches itself; ordinal 2 finalizes null
      assert(rows.toSeq === Seq((1L, Some(101L)), (2L, None), (9L, Some(999L))))
      // STATE CLEANUP under watermark: everything before the 10:50 advance
      // is past both state watermarks, so the join state must have evicted
      // the early rows — only the advance pair's rows (≤ ~2/side) may
      // remain. Unbounded-state bugs show up here as state ≥ all 5 rows.
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty && state.head.numRowsTotal <= 4,
        s"join state not evicted under watermark: ${state.head.numRowsTotal} rows")
    } finally q.stop()
  }
}
