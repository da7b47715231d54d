package graft

import graft.operators.Replay
import graft.streaming.{EventStreamPipeline, EventStreamRegistry, StreamCoordinator}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.util.concurrent.{ConcurrentLinkedQueue, TimeUnit}

/** Streaming semantics (SURVEY.md §2.4): ordered delivery, replay, POISON
  * stop, single-active-consumer fencing, registry lifecycle.
  */
// companion-object case class: nested-in-class case classes capture an
// outer instance and break typed-encoder codegen (janino fallback storm)
object StreamingSpec {
  case class Msg(body: String, ordinal: Long, ts_ms: Long)

  // Executor-path sink state: a static registry the serialized
  // SenderFactory reaches by NAME on the task side (local-mode tasks share
  // the JVM; on a real cluster the factory would open a network connection
  // instead — the factory abstraction is exactly that seam). opens/closes
  // count factory lifecycle calls for the per-partition open/close pin.
  val execSent = new java.util.concurrent.ConcurrentHashMap[String, ConcurrentLinkedQueue[String]]()
  val execOpens = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()

  final class QueueSender(name: String) extends EventStreamPipeline.SenderFactory {
    def open(): (String => Unit, () => Unit) = {
      val q = execSent.computeIfAbsent(name, _ => new ConcurrentLinkedQueue[String]())
      execOpens.computeIfAbsent(name, _ => new java.util.concurrent.atomic.AtomicInteger()).incrementAndGet()
      (q.add(_), () => ())
    }
  }
}

class StreamingSpec extends SparkSpec {
  import spark.implicits._
  import StreamingSpec.Msg

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    q.processAllAvailable()

  test("T1: enriched messages delivered in ordinal order; guards applied") {
    val coord = new StreamCoordinator
    val sent = new ConcurrentLinkedQueue[String]()
    val stream = MemoryStream[Msg](spark)
    val q = EventStreamPipeline.start(
      spark, stream.toDF(), "rk-order", Replay.FromOrdinal(0), coord, sent.add(_))
    try {
      stream.addData(
        Msg("""{"message_type": "t"}""", 2, 200L),
        Msg("cls|x: 1", 1, 100L),
        Msg("", 3, 300L)) // empty: not forwarded
      drain(q)
      val out = sent.toArray(new Array[String](0)).toSeq
      assert(out === Seq(
        "cls|x: 1|ordinal: 1|timestamp: 100",
        """{"ess_ordinal": 2, "ess_timestamp": 200, "message_type": "t"}"""))
    } finally coord.release("rk-order")
  }

  test("T1 executor path: same ordinal order + guards as the driver path (VERDICT r11 #8)") {
    val coord = new StreamCoordinator
    val stream = MemoryStream[Msg](spark)
    StreamingSpec.execSent.remove("rk-exec-order")
    val q = EventStreamPipeline.start(
      spark, stream.toDF(), "rk-exec-order", Replay.FromOrdinal(0), coord,
      _ => fail("driver send must not be used on the executor path"),
      executorSender = Some(new StreamingSpec.QueueSender("rk-exec-order")))
    try {
      stream.addData(
        Msg("""{"message_type": "t"}""", 2, 200L),
        Msg("cls|x: 1", 1, 100L),
        Msg("", 3, 300L)) // empty: not forwarded
      drain(q)
      val out = StreamingSpec.execSent.get("rk-exec-order")
        .toArray(new Array[String](0)).toSeq
      assert(out === Seq(
        "cls|x: 1|ordinal: 1|timestamp: 100",
        """{"ess_ordinal": 2, "ess_timestamp": 200, "message_type": "t"}"""))
    } finally coord.release("rk-exec-order")
  }

  test("T5 executor path: POISON truncates in-batch, stops the query, and later batches deliver nothing") {
    val coord = new StreamCoordinator
    val stream = MemoryStream[Msg](spark)
    StreamingSpec.execSent.remove("rk-exec-poison")
    val q = EventStreamPipeline.start(
      spark, stream.toDF(), "rk-exec-poison", Replay.FromOrdinal(0), coord,
      _ => fail("driver send must not be used on the executor path"),
      executorSender = Some(new StreamingSpec.QueueSender("rk-exec-poison")))
    stream.addData(Msg("ok|1", 1, 10L), Msg("POISON", 2, 20L), Msg("after|3", 3, 30L))
    drain(q)
    if (q.isActive) { // race a post-POISON batch in before the reaper lands
      stream.addData(Msg("late|4", 4, 40L))
      try drain(q) catch { case _: Exception => () }
    }
    val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(30)
    while (q.isActive && System.nanoTime() < deadline) Thread.sleep(50)
    assert(!q.isActive, "query should stop after POISON")
    val out = StreamingSpec.execSent.get("rk-exec-poison")
      .toArray(new Array[String](0)).toSeq
    assert(out === Seq("ok|1|ordinal: 1|timestamp: 10"), out)
    assert(coord.activeQuery("rk-exec-poison").isEmpty)
  }

  test("S3 streaming: replay from ordinal skips earlier messages") {
    val coord = new StreamCoordinator
    val sent = new ConcurrentLinkedQueue[String]()
    val stream = MemoryStream[Msg](spark)
    val q = EventStreamPipeline.start(
      spark, stream.toDF(), "rk-replay", Replay.FromOrdinal(3), coord, sent.add(_))
    try {
      stream.addData(Msg("a|1", 1, 10L), Msg("b|2", 2, 20L), Msg("c|3", 3, 30L), Msg("d|4", 4, 40L))
      drain(q)
      val out = sent.toArray(new Array[String](0)).toSeq
      assert(out === Seq("c|3|ordinal: 3|timestamp: 30", "d|4|ordinal: 4|timestamp: 40"))
    } finally coord.release("rk-replay")
  }

  test("T5: POISON stops the consumer and is not forwarded (app.py:463-467)") {
    val coord = new StreamCoordinator
    val sent = new ConcurrentLinkedQueue[String]()
    val stream = MemoryStream[Msg](spark)
    val q = EventStreamPipeline.start(
      spark, stream.toDF(), "rk-poison", Replay.FromOrdinal(0), coord, sent.add(_))
    stream.addData(Msg("ok|1", 1, 10L), Msg("POISON", 2, 20L), Msg("after|3", 3, 30L))
    drain(q)
    // the reaper thread stops the query asynchronously
    val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(30)
    while (q.isActive && System.nanoTime() < deadline) Thread.sleep(50)
    assert(!q.isActive, "query should stop after POISON")
    val out = sent.toArray(new Array[String](0)).toSeq
    assert(out === Seq("ok|1|ordinal: 1|timestamp: 10")) // nothing at/after POISON
    assert(coord.activeQuery("rk-poison").isEmpty)
  }

  test("T5: a POISON with a NULL ordinal still stops the consumer") {
    // code-review r17: the null-ordinal drop (sink) and the seek range
    // predicate (plan) both ran before the POISON check, so a pill whose
    // broker offset was missing was silently discarded and the consumer
    // lived on past it — the reference checks the body on EVERY message
    // regardless of offset metadata (app.py:463-467). ADVICE r17: with
    // no defined position the pill sorts LAST — records that arrived
    // before it in the same micro-batch still deliver (the reference's
    // loop forwards until it reaches the pill; it never drops pre-pill
    // records), THEN delivery stops.
    val coord = new StreamCoordinator
    val sent = new ConcurrentLinkedQueue[String]()
    val stream = MemoryStream[(String, Option[Long], Long)](spark)
    val q = EventStreamPipeline.start(
      spark, stream.toDF().toDF("body", "ordinal", "ts_ms"),
      "rk-nullpill", Replay.FromOrdinal(0), coord, sent.add(_))
    stream.addData(("ok|1", Some(1L), 10L), ("POISON", None, 20L))
    drain(q)
    val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(30)
    while (q.isActive && System.nanoTime() < deadline) Thread.sleep(50)
    assert(!q.isActive, "a null-ordinal POISON must still stop the query")
    assert(coord.poisonTaken)
    assert(sent.toArray(new Array[String](0)).toSeq ===
      Seq("ok|1|ordinal: 1|timestamp: 10"),
      "pre-pill records in the pill's batch deliver before the stop")
    assert(coord.activeQuery("rk-nullpill").isEmpty)
  }

  test("T5: a batch AFTER the POISON batch delivers nothing (latch outlives the batch)") {
    val coord = new StreamCoordinator
    val sent = new ConcurrentLinkedQueue[String]()
    val stream = MemoryStream[Msg](spark)
    val q = EventStreamPipeline.start(
      spark, stream.toDF(), "rk-poison2", Replay.FromOrdinal(0), coord, sent.add(_))
    stream.addData(Msg("ok|1", 1, 10L), Msg("POISON", 2, 20L))
    drain(q)
    // the stop is asynchronous: race a SECOND batch in before it lands —
    // the query-lifetime poison latch must suppress its delivery even if
    // the reaper has not stopped the query yet
    if (q.isActive) {
      stream.addData(Msg("late|3", 3, 30L))
      try drain(q) catch { case _: Exception => () } // query may stop mid-drain
    }
    val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(30)
    while (q.isActive && System.nanoTime() < deadline) Thread.sleep(50)
    assert(!q.isActive)
    val out = sent.toArray(new Array[String](0)).toSeq
    assert(out === Seq("ok|1|ordinal: 1|timestamp: 10"), out)
  }

  test("P8: second consumer displaces the first (memcached-fencing analog)") {
    val coord = new StreamCoordinator
    val s1 = MemoryStream[Msg](spark)
    val s2 = MemoryStream[Msg](spark)
    val q1 = EventStreamPipeline.start(
      spark, s1.toDF(), "rk-fence", Replay.Next, coord, _ => ())
    val q2 = EventStreamPipeline.start(
      spark, s2.toDF(), "rk-fence", Replay.Next, coord, _ => ())
    try {
      val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(30)
      while (q1.isActive && System.nanoTime() < deadline) Thread.sleep(50)
      assert(!q1.isActive, "first consumer should be fenced out")
      assert(q2.isActive)
      assert(coord.activeQuery("rk-fence").contains(q2))
    } finally coord.release("rk-fence")
  }

  test("registry lifecycle: create/list/lookup/delete with fence-first ordering") {
    val coord = new StreamCoordinator
    val reg = new EventStreamRegistry(secure = false, host = "h")
    val r1 = reg.create("account.events")
    val r2 = reg.create("dm.events")
    assert(reg.list().map(_.id) === Seq(r1.id, r2.id))
    assert(r1.location === s"ws://h/event-stream/${r1.uuid}")
    assert(reg.byUuid(r2.uuid).contains(r2))
    assert(r1.uuid.length === 22) // shortuuid analog
    // delete stops the active consumer for the routing key, then removes
    val stream = MemoryStream[Msg](spark)
    val q = EventStreamPipeline.start(
      spark, stream.toDF(), "account.events", Replay.Next, coord, _ => ())
    assert(reg.delete(r1.id, coord))
    val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(30)
    while (q.isActive && System.nanoTime() < deadline) Thread.sleep(50)
    assert(!q.isActive)
    assert(!reg.delete(r1.id, coord)) // 404 analog
    assert(reg.list().map(_.id) === Seq(r2.id))
    // GET /event-stream/version/ analog (app.py:596-604): protocol
    // enumeration + name + version, all non-empty
    val v = reg.version()
    assert(v.protocol === "DATAFRAME_STREAM" && v.name.nonEmpty && v.version.nonEmpty)
  }

  test("P3 streaming: malformed JSON bodies are dropped, not forwarded corrupted") {
    val coord = new StreamCoordinator
    val sent = new ConcurrentLinkedQueue[String]()
    val stream = MemoryStream[Msg](spark)
    val q = EventStreamPipeline.start(
      spark, stream.toDF(), "rk-malformed", Replay.FromOrdinal(0), coord, sent.add(_))
    try {
      stream.addData(Msg("{broken", 1, 10L), Msg("""{"ok": 1}""", 2, 20L))
      q.processAllAvailable()
      val out = sent.toArray(new Array[String](0)).toSeq
      assert(out === Seq("""{"ess_ordinal": 2, "ess_timestamp": 20, "ok": 1}"""))
    } finally coord.release("rk-malformed")
  }

  test("R20 streaming: ingest-time decontamination flags eval-overlapping docs per batch") {
    import graft.streaming.StreamingAggs
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("stream-decon").toString
    val evalDocs = Seq("alpha beta gamma delta epsilon zeta").toDF("text")
    val stream = MemoryStream[(Long, String)](spark)
    val got = new ConcurrentLinkedQueue[(Long, Boolean, Long)]()
    val q = StreamingAggs.startDecontamination(
      stream.toDF().toDF("doc_id", "text"), evalDocs, s"$dir/ckpt",
      batch => batch.select("doc_id", "contaminated", "n_contaminated_grams")
        .collect().foreach(r => got.add((r.getLong(0), r.getBoolean(1), r.getLong(2)))))
    try {
      // doc 1 shares a verbatim 5-gram with the eval set; doc 2 is clean;
      // doc 3 is too short to carry any 5-gram at all
      stream.addData(
        (1L, "x alpha beta gamma delta epsilon y"),
        (2L, "totally unrelated words go here now"),
        (3L, "tiny doc"))
      q.processAllAvailable()
      // a later batch is gated independently (stateless gate)
      stream.addData((4L, "beta gamma delta epsilon zeta trailing"))
      q.processAllAvailable()
    } finally q.stop()
    val byDoc = got.toArray(new Array[(Long, Boolean, Long)](0))
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byDoc === Map(
      1L -> ((true, 1L)), 2L -> ((false, 0L)), 3L -> ((false, 0L)),
      4L -> ((true, 1L))), byDoc.toString)
  }

  test("R18 streaming: incremental near-dup gates the stream against the accepted corpus") {
    import graft.streaming.StreamingAggs
    val dir = java.nio.file.Files.createTempDirectory("inc-neardup").toString
    val baseText = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
    val dupOfBase = baseText.replace(" tango", " zulu")      // 1 tail token differs
    val laterDup = baseText.replace("alpha ", "yankee ")     // 1 head token differs
    val unrelated1 = "one two three four five six seven eight nine ten eleven twelve"
    val unrelated2 = "red orange yellow green blue indigo violet umber ochre teal cyan navy"
    // ONE query, one checkpoint lineage — batchIds 0, 1, 2 (batch
    // partitions key on batchId, so a lineage owns its slices)
    val stream = MemoryStream[(Long, String)](spark)
    val got = new ConcurrentLinkedQueue[(Long, Boolean)]()
    val q = StreamingAggs.startIncrementalNearDup(
      stream.toDF().toDF("doc_id", "text"), s"$dir/state", s"$dir/ckpt",
      batch => batch.select("doc_id", "is_neardup").collect()
        .foreach(r => got.add((r.getLong(0), r.getBoolean(1)))))
    try {
      // batch 0: base accepted; its intra-batch near-dup (higher id)
      // flagged; an unrelated doc accepted
      stream.addData((1L, baseText), (2L, dupOfBase), (3L, unrelated1))
      q.processAllAvailable()
      // batch 1: a near-dup of the ACCEPTED base arriving later is flagged
      // cross-batch; fresh content is accepted
      stream.addData((4L, laterDup), (5L, unrelated2))
      q.processAllAvailable()
      // batch 2: near-dup of batch 1's accept is flagged; fresh passes
      stream.addData((6L, unrelated2 + " extra"), (7L, "fresh words entirely new here today"))
      q.processAllAvailable()
    } finally q.stop()
    val flags = got.toArray(new Array[(Long, Boolean)](0)).toMap
    assert(flags === Map(1L -> false, 2L -> true, 3L -> false,
      4L -> true, 5L -> false, 6L -> true, 7L -> false), flags.toString)
    // replay stability: re-delivering batch 0's docs as batch 0 (fresh
    // checkpoint, same state — the post-write-pre-commit crash shape)
    // excludes its own batch=0 slice from the probe, reproducing the first
    // attempt's flags and rewriting identical state
    val rStream = MemoryStream[(Long, String)](spark)
    val rGot = new ConcurrentLinkedQueue[(Long, Boolean)]()
    val rq = StreamingAggs.startIncrementalNearDup(
      rStream.toDF().toDF("doc_id", "text"), s"$dir/state", s"$dir/ckpt-replay",
      batch => batch.select("doc_id", "is_neardup").collect()
        .foreach(r => rGot.add((r.getLong(0), r.getBoolean(1)))))
    try {
      rStream.addData((1L, baseText), (2L, dupOfBase), (3L, unrelated1))
      rq.processAllAvailable()
    } finally rq.stop()
    val replay = rGot.toArray(new Array[(Long, Boolean)](0)).toMap
    assert(replay === Map(1L -> false, 2L -> true, 3L -> false), replay.toString)
    // accepted state: docs 1,3 (batch 0, rewritten identically), 5 (b1), 7 (b2)
    val state = spark.read.parquet(s"$dir/state/shingles")
      .select("doc_id").as[Long].collect().sorted
    assert(state.toSeq === Seq(1L, 3L, 5L, 7L), state.toSeq.toString)
  }

  test("R17 streaming: incremental dedup marks only first-seen content across batches") {
    import graft.functions.TextFunctions.sha256Hex
    import graft.streaming.StreamingAggs
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("inc-dedup").toString
    val seenDir = s"$dir/seen"
    // seed the accepted base corpus, as d_dedup_incremental's base sha set
    // (the sha table is batch-partitioned; the seed is the batch=-1 slice)
    Seq("base-a", "base-b").toDF("text")
      .select(sha256Hex(col("text")).as("content_sha"))
      .write.parquet(s"$seenDir/batch=-1")
    val stream = MemoryStream[(Long, String)](spark)
    val got = new ConcurrentLinkedQueue[(Long, Boolean)]()
    val q = StreamingAggs.startIncrementalDedup(
      stream.toDF().toDF("doc_id", "text"), seenDir, s"$dir/ckpt",
      batch => batch.select("doc_id", "is_new").collect()
        .foreach(r => got.add((r.getLong(0), r.getBoolean(1)))))
    try {
      // batch 1: base dup, a new doc, an intra-batch dup of it, another new
      stream.addData((1L, "base-a"), (2L, "fresh-1"), (3L, "fresh-1"), (4L, "fresh-2"))
      q.processAllAvailable()
      // batch 2: dup of batch-1's accept, base dup, genuinely new
      stream.addData((5L, "fresh-1"), (6L, "base-b"), (7L, "fresh-3"))
      q.processAllAvailable()
    } finally q.stop()
    val byDoc = got.toArray(new Array[(Long, Boolean)](0)).toMap
    assert(byDoc === Map(1L -> false, 2L -> true, 3L -> false, 4L -> true,
      5L -> false, 6L -> false, 7L -> true), byDoc.toString)
    // the accepted set now carries base + the three accepted shas, each
    // exactly once — the per-batch partition commit never duplicates rows
    assert(spark.read.parquet(seenDir).select("content_sha").distinct().count() === 5)
    assert(spark.read.parquet(seenDir).count() === 5)
    // replay stability: re-delivering batch 0's docs as batch 0 (fresh
    // checkpoint, same sha table — the post-append-pre-commit crash shape)
    // must reproduce the first attempt's flags, not flip them, and must
    // leave the sha table unchanged (idempotent partition overwrite)
    val stream2 = MemoryStream[(Long, String)](spark)
    val got2 = new ConcurrentLinkedQueue[(Long, Boolean)]()
    val q2 = StreamingAggs.startIncrementalDedup(
      stream2.toDF().toDF("doc_id", "text"), seenDir, s"$dir/ckpt-replay",
      batch => batch.select("doc_id", "is_new").collect()
        .foreach(r => got2.add((r.getLong(0), r.getBoolean(1)))))
    try {
      stream2.addData((2L, "fresh-1"), (4L, "fresh-2"))
      q2.processAllAvailable()
    } finally q2.stop()
    val replayed = got2.toArray(new Array[(Long, Boolean)](0)).toMap
    assert(replayed === Map(2L -> true, 4L -> true),
      s"replayed batch 0 must re-mark its accepts is_new=true: $replayed")
    assert(spark.read.parquet(seenDir).count() === 5, "replay must not grow the sha table")
  }

  test("R17/R18/R20 streaming capstone: composed corpus gate audits every drop reason") {
    import graft.functions.TextFunctions.sha256Hex
    import graft.streaming.StreamingAggs
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("corpus-gate").toString
    val seenDir = s"$dir/seen"
    val seedText = "seeded base document previously accepted fine"
    Seq(seedText).toDF("text")
      .select(sha256Hex(col("text")).as("content_sha"))
      .write.parquet(s"$seenDir/batch=-1")
    val evalDocs = Seq("alpha beta gamma delta epsilon zeta").toDF("text")
    val goodText = "quick brown fox jumps over lazy dog tonight"
    // fails ONLY quality: no dup 2-gram, top token exactly at (not past)
    // the 0.25 dominance dial, but diversity 4/12 sinks the blend to ~0.41
    val lowQuality = "a b c d a c b d b a d c"
    // passes quality (diverse, long) but trips the dominance dial: 5/17
    val repetitive = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima loop loop loop loop loop"
    // carries the eval 5-gram "alpha beta gamma delta epsilon" verbatim
    val contaminated = "xx alpha beta gamma delta epsilon yy"
    val stream = MemoryStream[(Long, String)](spark)
    type Flags = (Double, Boolean, Boolean, Boolean, Boolean)
    val got = new ConcurrentLinkedQueue[(Long, Flags)]()
    val q = StreamingAggs.startCorpusGate(
      stream.toDF().toDF("doc_id", "text"), evalDocs, seenDir, s"$dir/ckpt",
      batch => batch.select("doc_id", "quality", "repetitive", "contaminated",
          "is_new", "accepted").collect()
        .foreach(r => got.add((r.getLong(0), (r.getDouble(1), r.getBoolean(2),
          r.getBoolean(3), r.getBoolean(4), r.getBoolean(5))))))
    try {
      // batch 0: one doc per drop reason + one clean accept + an
      // intra-batch twin of the accept (rank-2 on its sha)
      stream.addData((1L, goodText), (2L, lowQuality), (3L, repetitive),
        (4L, contaminated), (5L, seedText), (6L, goodText))
      q.processAllAvailable()
      // batch 1: the batch-0 accept arriving again is now state-rejected;
      // fresh content passes
      stream.addData((7L, goodText), (8L, "entirely fresh words arriving later today"))
      q.processAllAvailable()
    } finally q.stop()
    val byDoc = got.toArray(new Array[(Long, Flags)](0)).toMap
    assert(byDoc(1L)._5 && byDoc(1L)._4, s"doc 1 must be accepted: ${byDoc(1L)}")
    // each rejected doc names its gate — and trips ONLY that gate
    assert(byDoc(2L)._1 < 0.52 && !byDoc(2L)._2 && !byDoc(2L)._3 && byDoc(2L)._4
      && !byDoc(2L)._5, s"doc 2 must fail quality alone: ${byDoc(2L)}")
    assert(byDoc(3L)._1 >= 0.52 && byDoc(3L)._2 && !byDoc(3L)._3 && !byDoc(3L)._5,
      s"doc 3 must fail repetition: ${byDoc(3L)}")
    assert(byDoc(4L)._1 >= 0.52 && !byDoc(4L)._2 && byDoc(4L)._3 && !byDoc(4L)._5,
      s"doc 4 must fail decontamination: ${byDoc(4L)}")
    assert(!byDoc(5L)._4 && !byDoc(5L)._5, s"doc 5 is a seed dup: ${byDoc(5L)}")
    assert(!byDoc(6L)._4 && !byDoc(6L)._5, s"doc 6 is an intra-batch dup: ${byDoc(6L)}")
    assert(!byDoc(7L)._4 && !byDoc(7L)._5, s"doc 7 dups batch 0's accept: ${byDoc(7L)}")
    assert(byDoc(8L)._5, s"doc 8 must be accepted: ${byDoc(8L)}")
    // state: seed + the two accepted shas, exactly once each — gated-out
    // docs never enter the table
    assert(spark.read.parquet(seenDir).count() === 3)
  }

  test("R17/R18/R20 streaming: full corpus pipeline — gates then near-dup, one stream") {
    import graft.streaming.StreamingAggs
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("corpus-pipeline").toString
    val evalDocs = Seq("benchmark holdout grams live only here today").toDF("text")
    val baseText = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
    val intraDup = baseText.replace(" tango", " zulu")   // near-dup, same batch
    val crossDup = baseText.replace("alpha ", "yankee ") // near-dup, later batch
    val repetitive = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima loop loop loop loop loop"
    val unrelated1 = "one two three four five six seven eight nine ten eleven twelve"
    val unrelated2 = "red orange yellow green blue indigo violet umber ochre teal cyan navy"
    val stream = MemoryStream[(Long, String)](spark)
    type V = (Boolean, Boolean, Boolean, Boolean) // repetitive, is_new, is_neardup, accepted
    val got = new ConcurrentLinkedQueue[(Long, V)]()
    val q = StreamingAggs.startCorpusPipeline(
      stream.toDF().toDF("doc_id", "text"), evalDocs, s"$dir/state", s"$dir/ckpt",
      batch => batch.select("doc_id", "repetitive", "is_new", "is_neardup", "accepted")
        .collect().foreach(r => got.add((r.getLong(0),
          (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))))))
    try {
      // batch 0: an accept, its intra-batch near-dup, a repetition reject,
      // an unrelated accept
      stream.addData((1L, baseText), (2L, intraDup), (3L, repetitive), (4L, unrelated1))
      q.processAllAvailable()
      // batch 1: a cross-batch near-dup of the accepted base, an exact dup
      // of an accepted doc (dedup gate — never reaches the near-dup probe),
      // and fresh content
      stream.addData((5L, crossDup), (6L, unrelated1), (7L, unrelated2))
      q.processAllAvailable()
    } finally q.stop()
    val byDoc = got.toArray(new Array[(Long, V)](0)).toMap
    assert(byDoc(1L) === ((false, true, false, true)), byDoc(1L).toString)
    assert(byDoc(2L) === ((false, true, true, false)),
      s"doc 2 must fall to the INTRA-batch near-dup probe: ${byDoc(2L)}")
    assert(byDoc(3L) === ((true, true, false, false)),
      s"doc 3 fails repetition and must never reach the near-dup probe: ${byDoc(3L)}")
    assert(byDoc(4L) === ((false, true, false, true)), byDoc(4L).toString)
    assert(byDoc(5L) === ((false, true, true, false)),
      s"doc 5 must fall to the CROSS-batch near-dup probe: ${byDoc(5L)}")
    assert(byDoc(6L) === ((false, false, false, false)),
      s"doc 6 is an exact dup — dedup gate, not near-dup: ${byDoc(6L)}")
    assert(byDoc(7L) === ((false, true, false, true)), byDoc(7L).toString)
    // both state families carry exactly the fully-accepted docs (1, 4, 7)
    assert(spark.read.parquet(s"$dir/state/sha").count() === 3)
    val ndState = spark.read.parquet(s"$dir/state/neardup/shingles")
      .select("doc_id").as[Long].collect().sorted
    assert(ndState.toSeq === Seq(1L, 4L, 7L), ndState.toSeq.toString)
  }

  test("R20/T4 streaming: source-mixing stage rebalances to the accumulated token budget") {
    import graft.streaming.StreamingAggs
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("corpus-mix").toString
    val evalDocs = Seq("benchmark holdout grams live only here today").toDF("text")
    // four 20-token all-distinct-token docs (quality >= 0.8, no shingle
    // overlap, no repetition) — every upstream gate passes, so the mix
    // draw is the only thing that can reject
    def doc(i: Int): String =
      (0 until 20).map(j => s"tok${i}x$j").mkString(" ")
    val stream = MemoryStream[(Long, String, String)](spark)
    type V = (Double, Boolean, Boolean) // mix_weight, mix_kept, accepted
    val got = new ConcurrentLinkedQueue[(Long, V)]()
    val q = StreamingAggs.startCorpusPipeline(
      stream.toDF().toDF("doc_id", "text", "source"), evalDocs,
      s"$dir/state", s"$dir/ckpt",
      batch => batch.select("doc_id", "mix_weight", "mix_kept", "accepted")
        .collect().foreach(r => got.add((r.getLong(0),
          (r.getDouble(1), r.getBoolean(2), r.getBoolean(3))))),
      sourceMix = true)
    try {
      // batch 0: NO prior totals — every weight 1.0, everything kept.
      // Accepted totals after the batch: src0 = 60 tokens, src1 = 20.
      stream.addData((1L, doc(1), "src0"), (2L, doc(2), "src0"),
        (3L, doc(3), "src0"), (4L, doc(4), "src1"))
      q.processAllAvailable()
      // batch 1: budget = 80/2 = 40 ⇒ w(src0) = 40/60 = 0.6667,
      // w(src1) = 1. The LCG draw (h/2^31): doc 10 → 0.1386 (kept),
      // doc 13 → 0.6802 (> 2/3 ⇒ mix-DROPPED), doc 14 → src1, kept.
      stream.addData((10L, doc(10), "src0"), (13L, doc(13), "src0"),
        (14L, doc(14), "src1"))
      q.processAllAvailable()
    } finally q.stop()
    val byDoc = got.toArray(new Array[(Long, V)](0)).toMap
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(byDoc(id) === ((1.0, true, true)), s"batch 0 doc $id: ${byDoc(id)}")
    }
    assert(math.abs(byDoc(10L)._1 - 2.0 / 3.0) < 1e-9 && byDoc(10L)._2 &&
      byDoc(10L)._3, s"doc 10 draws 0.1386 < 2/3 and stays: ${byDoc(10L)}")
    assert(math.abs(byDoc(13L)._1 - 2.0 / 3.0) < 1e-9 && !byDoc(13L)._2 &&
      !byDoc(13L)._3,
      s"doc 13 draws 0.6802 > 2/3 — the ONLY gate that rejects it is the " +
        s"mix draw: ${byDoc(13L)}")
    assert(byDoc(14L) === ((1.0, true, true)),
      s"src1 is under budget, weight 1: ${byDoc(14L)}")
    // mix state accumulates per (source, batch) from FINAL accepted docs
    // only: batch 0 = {src0: 60, src1: 20}, batch 1 = {src0: 20 (doc 13
    // dropped), src1: 20}
    val mixState = Set(("src0", 60L, 0), ("src1", 20L, 0),
      ("src0", 20L, 1), ("src1", 20L, 1))
    val mix = spark.read.parquet(s"$dir/state/mix")
      .select("source", "src_tokens", "batch")
      .as[(String, Long, Int)].collect().toSet
    assert(mix === mixState, mix.toString)
    // every gate-rejected doc appends NO state anywhere
    assert(spark.read.parquet(s"$dir/state/sha").count() === 6)
    // replay stability: re-delivering batch 0's docs as batch 0 (fresh
    // checkpoint, same state — the post-write-pre-commit crash shape)
    // must re-derive weights EXCLUDING its own mix/batch=0 slice: src0's
    // weight stays 1.0 (a broken exclusion would fold the slice into an
    // 80-token src0 history ⇒ weight 0.75), every verdict reproduces,
    // and the batch rewrites identical state
    val rStream = MemoryStream[(Long, String, String)](spark)
    val rGot = new ConcurrentLinkedQueue[(Long, V)]()
    val rq = StreamingAggs.startCorpusPipeline(
      rStream.toDF().toDF("doc_id", "text", "source"), evalDocs,
      s"$dir/state", s"$dir/ckpt-replay",
      batch => batch.select("doc_id", "mix_weight", "mix_kept", "accepted")
        .collect().foreach(r => rGot.add((r.getLong(0),
          (r.getDouble(1), r.getBoolean(2), r.getBoolean(3))))),
      sourceMix = true)
    try {
      rStream.addData((1L, doc(1), "src0"), (2L, doc(2), "src0"),
        (3L, doc(3), "src0"), (4L, doc(4), "src1"))
      rq.processAllAvailable()
    } finally rq.stop()
    val rByDoc = rGot.toArray(new Array[(Long, V)](0)).toMap
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(rByDoc(id) === ((1.0, true, true)),
        s"replayed batch 0 doc $id must reproduce its first attempt: ${rByDoc(id)}")
    }
    val rMix = spark.read.parquet(s"$dir/state/mix")
      .select("source", "src_tokens", "batch")
      .as[(String, Long, Int)].collect().toSet
    assert(rMix === mixState, s"replay must rewrite identical state: $rMix")
  }

  test("T6: stream-join state partitions autosize from per-batch key cardinality") {
    // VERDICT r13 #7: the r12 study pinned 8 partitions at the bench
    // fixture (throughput ∝ 1/partitions when per-partition state is
    // small); the heuristic must DERIVE that same 8 from the fixture's
    // ~10k keys/batch, clamp to the caller's parallelism ceiling, stay
    // power-of-two stable under drift, and grow monotonically.
    import graft.streaming.StreamingAggs.stateJoinPartitions
    assert(stateJoinPartitions(10000) === 8,
      "the bench fixture estimate (100k rows / 10 batches) must land on the pinned 8")
    assert(stateJoinPartitions(0) === 1 && stateJoinPartitions(1) === 1)
    assert(stateJoinPartitions(2048) === 1, "exactly one target-load partition")
    assert(stateJoinPartitions(2049) === 2)
    assert(stateJoinPartitions(1000000) === 32,
      "default cap is the session shuffle-partition ceiling")
    assert(stateJoinPartitions(1000000, maxPartitions = 512) === 512,
      "at scale the cap, not the key estimate, binds")
    // power-of-two rounding: small estimate drift must not resize state
    assert(stateJoinPartitions(9000) === stateJoinPartitions(12000))
    val xs = Seq(1L, 100L, 2048L, 4096L, 10000L, 50000L)
      .map(stateJoinPartitions(_, maxPartitions = 1024))
    assert(xs === xs.sorted, s"monotone in the estimate: $xs")
  }

  test("R20/T4 streaming: PII scrub runs before the gates; stream scrub ≡ batch scrub") {
    // VERDICT r13 #8: the ingest gate scrubs BEFORE accepting — per-class
    // hit counts ride in the verdict frame, downstream gates (sha dedup,
    // quality, near-dup) see only scrubbed text, and the per-batch stream
    // stage equals the batch piiStages applied to the same planted docs.
    import graft.streaming.StreamingAggs
    import graft.functions.TextFunctions.sha256Hex
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("corpus-pii").toString
    val evalDocs = Seq("benchmark holdout grams live only here today").toDF("text")
    // 20 distinct tokens per doc (clears quality/repetition) + one planted
    // PII class each; doc 4 is clean; doc 5 duplicates doc 1 EXACTLY after
    // scrubbing only (different raw emails, same <EMAIL> tag) — the sha
    // gate must catch it, proving dedup runs on scrubbed text
    def base(i: Int): String = (0 until 20).map(j => s"tok${i}x$j").mkString(" ")
    val d1 = base(1) + " contact user1@example.com now"
    val d2 = base(2) + " call 555-1234 today"
    val d3 = base(3) + " ssn 123456789 ref"
    val d4 = base(4)
    val d5 = base(1) + " contact other9@example.org now" // scrub-dup of d1
    val docs = Seq(1L -> d1, 2L -> d2, 3L -> d3, 4L -> d4, 5L -> d5)
    val stream = MemoryStream[(Long, String)](spark)
    type V = (Int, Int, Int, Int, String, Boolean) // n_email/phone/id/pii, sha, accepted
    val got = new ConcurrentLinkedQueue[(Long, V)]()
    val q = StreamingAggs.startCorpusPipeline(
      stream.toDF().toDF("doc_id", "text"), evalDocs, s"$dir/state", s"$dir/ckpt",
      batch => batch.select("doc_id", "n_email", "n_phone", "n_id", "n_pii",
          "content_sha", "accepted")
        .collect().foreach(r => got.add((r.getLong(0),
          (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
            r.getString(5), r.getBoolean(6))))),
      piiScrub = true)
    try {
      stream.addData(docs: _*)
      q.processAllAvailable()
    } finally q.stop()
    val byDoc = got.toArray(new Array[(Long, V)](0)).toMap

    // batch twin: the SAME piiStages over the same docs, plain DataFrame
    val (ne, np, ni, scrubbed) =
      graft.operators.Round13Queries.piiStages(col("text"))
    val twin = docs.toDF("doc_id", "text")
      .select(col("doc_id"), ne.as("ne"), np.as("np"), ni.as("ni"),
        sha256Hex(scrubbed).as("sha"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    docs.foreach { case (id, _) =>
      val s = byDoc(id); val b = twin(id)
      assert((s._1, s._2, s._3) === ((b._1, b._2, b._3)),
        s"doc $id stream counts must equal batch scrub: $s vs $b")
      assert(s._4 === s._1 + s._2 + s._3)
      assert(s._5 === b._4, s"doc $id content sha must be over SCRUBBED text")
    }
    assert(byDoc(1L)._1 === 1 && byDoc(2L)._2 === 1 && byDoc(3L)._3 === 1 &&
      byDoc(4L)._4 === 0, "each planted class detected exactly once")
    // dedup on scrubbed text: d5 collapses onto d1's scrubbed sha
    assert(byDoc(5L)._5 === byDoc(1L)._5 && !byDoc(5L)._6,
      s"doc 5 must dedup against doc 1 post-scrub: ${byDoc(5L)}")
    assert(Seq(1L, 2L, 3L, 4L).forall(byDoc(_)._6), "clean + scrubbed docs accept")
    // retained state is PII-free by construction: exactly the 4 accepted
    // scrubbed shas, none equal to a raw-text sha
    val rawShas = docs.toDF("doc_id", "text")
      .select(sha256Hex(col("text"))).as[String].collect().toSet
    val state = spark.read.parquet(s"$dir/state/sha")
      .select("content_sha").as[String].collect().toSet
    assert(state === Seq(1L, 2L, 3L, 4L).map(byDoc(_)._5).toSet)
    assert(state.intersect(rawShas) === Set(byDoc(4L)._5),
      "only the PII-free doc's sha may match its raw form")
  }

  test("R20/T4 streaming: the simple corpus gate composes the same PII scrub") {
    // API symmetry with startCorpusPipeline(piiScrub = true): the plain
    // gate scrubs before its four gates too, counts ride the verdict, and
    // the sha state holds the scrubbed form
    import graft.streaming.StreamingAggs
    import graft.functions.TextFunctions.sha256Hex
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("gate-pii").toString
    val evalDocs = Seq("benchmark holdout grams live only here today").toDF("text")
    val text = (0 until 20).map(j => s"gk$j").mkString(" ") +
      " contact gate.user@example.com now"
    val got = new ConcurrentLinkedQueue[(Int, String, Boolean)]()
    val stream = MemoryStream[(Long, String)](spark)
    val q = StreamingAggs.startCorpusGate(
      stream.toDF().toDF("doc_id", "text"), evalDocs, s"$dir/sha", s"$dir/ckpt",
      batch => batch.select("n_email", "content_sha", "accepted")
        .collect().foreach(r => got.add((r.getInt(0), r.getString(1), r.getBoolean(2)))),
      piiScrub = true)
    try {
      stream.addData((1L, text))
      q.processAllAvailable()
    } finally q.stop()
    val (nEmail, sha, accepted) = got.poll()
    val expectedSha = Seq(text).toDF("text")
      .select(sha256Hex(graft.operators.Round13Queries.piiStages(col("text"))._4))
      .as[String].head()
    assert(nEmail === 1 && accepted, s"($nEmail, $accepted)")
    assert(sha === expectedSha, "gate sha must be over the scrubbed text")
    assert(spark.read.parquet(s"$dir/sha").select("content_sha")
      .as[String].collect().toSeq === Seq(expectedSha))
  }

  test("R20/R12/T4 streaming: packing stage continues bins across batches; rejects consume no bin space") {
    import graft.streaming.StreamingAggs
    val dir = java.nio.file.Files.createTempDirectory("corpus-pack").toString
    val evalDocs = Seq("benchmark holdout grams live only here today").toDF("text")
    // 300 distinct tokens per doc (quality ≥ 0.8, no overlap, not
    // repetitive) so the packing draw is isolated; binCap 512 ⇒ a second
    // 300-token doc on the same shard STRADDLES bins 0→1
    def doc(i: Int): String = (0 until 300).map(j => s"w${i}x$j").mkString(" ")
    val repetitive = Seq.fill(300)("loop").mkString(" ")
    val stream = MemoryStream[(Long, String)](spark)
    type P = (Long, Long, Long, Long, Long) // shard, n_tokens, start, end, off
    val packed = new ConcurrentLinkedQueue[(Long, P)]()
    val q = StreamingAggs.startCorpusPipeline(
      stream.toDF().toDF("doc_id", "text"), evalDocs,
      s"$dir/state", s"$dir/ckpt", _ => (),
      packSequences = true,
      onPacked = b => b.collect().foreach(r => packed.add((r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))))
    try {
      // batch 0: shard 1 and shard 2 each get one 300-token doc
      stream.addData((1L, doc(1)), (2L, doc(2)))
      q.processAllAvailable()
      // batch 1: shard 1 gets an accepted doc (bin cursor at 300 ⇒
      // straddles 0→1), a REPETITION reject (no bin space), and another
      // accepted doc (cursor at 600 ⇒ fully inside bin 1); shard 2's
      // cursor continues independently
      stream.addData((33L, doc(33)), (65L, repetitive), (97L, doc(97)),
        (34L, doc(34)))
      q.processAllAvailable()
    } finally q.stop()
    val byDoc = packed.toArray(new Array[(Long, P)](0)).toMap
    assert(byDoc(1L) === ((1L, 300L, 0L, 0L, 0L)), byDoc(1L).toString)
    assert(byDoc(2L) === ((2L, 300L, 0L, 0L, 0L)), byDoc(2L).toString)
    assert(byDoc(33L) === ((1L, 300L, 0L, 1L, 300L)),
      s"doc 33 must straddle the batch-0 bin boundary: ${byDoc(33L)}")
    assert(byDoc(97L) === ((1L, 300L, 1L, 1L, 88L)),
      s"doc 97's cursor must skip the rejected doc 65: ${byDoc(97L)}")
    assert(byDoc(34L) === ((2L, 300L, 0L, 1L, 300L)),
      s"shard 2's cursor continues independently: ${byDoc(34L)}")
    assert(!byDoc.contains(65L), "rejected docs must not be packed")
    // cursor state: one row per (shard, batch) from accepted tokens only
    val st = spark.read.parquet(s"$dir/state/pack")
      .select("shard", "shard_tokens", "batch")
      .as[(Long, Long, Int)].collect().toSet
    assert(st === Set((1L, 300L, 0), (2L, 300L, 0), (1L, 600L, 1),
      (2L, 300L, 1)), st.toString)
  }

  test("R20/T4 streaming: null-text doc stays visible with accepted=false; _temporary-only state dir does not wedge") {
    // code-review r17, two fixes in one lifecycle: (1) a null-text doc
    // used to VANISH from the batch (repetition() emits no row for null
    // text and markGates joined inner) — it must surface with
    // has_text=false and an accepted=false audit row; (2) a crash during
    // a state family's FIRST commit leaves the dir holding only
    // _temporary, and schema inference over zero footers threw on every
    // replay — with the explicit read schema the batch proceeds.
    import graft.streaming.StreamingAggs
    val dir = java.nio.file.Files.createTempDirectory("gate-nulltext").toString
    // the wedge shape: state dir exists, holds only _temporary
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/sha/_temporary"))
    val evalDocs = Seq("benchmark holdout grams live only here today").toDF("text")
    val good = (0 until 20).map(j => s"nt$j").mkString(" ")
    type V = (Boolean, Boolean) // has_text, accepted
    val got = new ConcurrentLinkedQueue[(Long, V)]()
    val stream = MemoryStream[(Long, String)](spark)
    val q = StreamingAggs.startCorpusGate(
      stream.toDF().toDF("doc_id", "text"), evalDocs, s"$dir/sha", s"$dir/ckpt",
      batch => batch.select("doc_id", "has_text", "accepted")
        .collect().foreach(r => got.add((r.getLong(0),
          (r.getBoolean(1), r.getBoolean(2))))))
    try {
      stream.addData((1L, null), (2L, good), (3L, ""))
      q.processAllAvailable()
    } finally q.stop()
    val byDoc = got.toArray(new Array[(Long, V)](0)).toMap
    assert(byDoc.keySet === Set(1L, 2L, 3L),
      s"every doc must surface in the audit frame: ${byDoc.keySet}")
    assert(byDoc(1L) === ((false, false)), s"null text: ${byDoc(1L)}")
    assert(byDoc(2L) === ((true, true)), s"real text: ${byDoc(2L)}")
    assert(byDoc(3L) === ((false, false)), s"empty text: ${byDoc(3L)}")
    // only the real doc's sha entered state
    assert(spark.read.parquet(s"$dir/sha").count() === 1)
  }

  test("R17/R20/T4 streaming: boilerplate line scrub — batch ≡ stream, frequency accumulates across batches") {
    // VERDICT r16 #7: d_line_dedup's streaming twin. Lines over the
    // MaxDocsPerLine(=2) distinct-doc cut scrub from `text` BEFORE the
    // gates; the frequency state accumulates, so a line that crosses the
    // cut only via a LATER batch scrubs from that batch's docs (causal
    // at-ingest — earlier emissions stand).
    import graft.streaming.StreamingAggs
    import graft.operators.Round15Queries
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("corpus-lines").toString
    val evalDocs = Seq("benchmark holdout grams live only here today").toDF("text")
    val nav = "home about contact"   // 3 tokens = one synthesized line
    val chrome = "foo bar baz"
    // bodies are 6 distinct tokens (two 3-token lines) so the SCRUBBED
    // text still clears the quality/repetition dials — a 3-token residue
    // trips the small-denominator repetition artifact, which is not what
    // this test is about
    val docs: Seq[(Long, String)] = Seq(
      1L -> s"$nav alpha beta gamma delta epsilon zeta",   // batch 0
      2L -> s"eta theta iota kappa lambda mu $nav",        // batch 0
      3L -> s"$nav omega psi chi phi upsilon tau",         // batch 1: nav hits ndocs 3
      4L -> s"$chrome one two three four five six",        // batch 1: chrome intra-batch
      5L -> s"seven eight nine ten eleven twelve $chrome", // batch 1
      6L -> s"$chrome red orange yellow green blue indigo", // batch 1
      7L -> chrome)                                        // batch 1: ALL chrome
    type V = (String, Long, Long, Boolean) // text, n_lines, n_kept_lines, accepted
    val got = new ConcurrentLinkedQueue[(Long, V)]()
    val stream = MemoryStream[(Long, String)](spark)
    val q = StreamingAggs.startCorpusPipeline(
      stream.toDF().toDF("doc_id", "text"), evalDocs, s"$dir/state", s"$dir/ckpt",
      batch => batch.select("doc_id", "text", "n_lines", "n_kept_lines", "accepted")
        .collect().foreach(r => got.add((r.getLong(0),
          (r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))),
      lineScrub = true)
    try {
      stream.addData(docs(0), docs(1))
      q.processAllAvailable()
      stream.addData(docs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val byDoc = got.toArray(new Array[(Long, V)](0)).toMap
    // batch 0: nav is in only 2 docs so far — ≤ cut, everything survives
    assert(byDoc(1L) ===
      ((s"$nav alpha beta gamma delta epsilon zeta", 3L, 3L, true)), byDoc(1L).toString)
    assert(byDoc(2L) ===
      ((s"eta theta iota kappa lambda mu $nav", 3L, 3L, true)), byDoc(2L).toString)
    // batch 1: accumulated nav count = 3 > 2 ⇒ scrubbed from doc 3;
    // chrome reaches 4 docs WITHIN the batch ⇒ scrubbed from all four
    assert(byDoc(3L) === (("omega psi chi phi upsilon tau", 3L, 2L, true)),
      s"accumulated frequency must scrub nav from the later doc: ${byDoc(3L)}")
    assert(byDoc(4L) === (("one two three four five six", 3L, 2L, true)), byDoc(4L).toString)
    assert(byDoc(5L) === (("seven eight nine ten eleven twelve", 3L, 2L, true)), byDoc(5L).toString)
    assert(byDoc(6L) === (("red orange yellow green blue indigo", 3L, 2L, true)), byDoc(6L).toString)
    // the ALL-chrome doc scrubs to "" and must be REJECTED (pure chrome
    // is not corpus material; without the n_kept_lines gate the quality
    // blend would score "" at 0.8 and accept it)
    assert(byDoc(7L) === (("", 1L, 0L, false)), byDoc(7L).toString)
    // line-frequency state: one slice per batch, nav counted 2 then 1
    val navHash = Seq(nav).toDF("line")
      .select(org.apache.spark.sql.functions.xxhash64(col("line")))
      .as[Long].head()
    val navCounts = spark.read.parquet(s"$dir/state/lines")
      .filter(col("lh") === navHash)
      .select("ndocs", "batch").as[(Long, Int)].collect().toSet
    assert(navCounts === Set((2L, 0), (1L, 1)), navCounts.toString)
    // rejected docs burn no sha state: exactly the six accepted shas
    assert(spark.read.parquet(s"$dir/state/sha").count() === 6)

    // stream ≡ batch: the same corpus in ONE batch reproduces the batch
    // operator's reconstruction exactly (shared formation/cut/rebuild)
    type W = (String, Long, Long) // text, n_lines, n_kept_lines
    val expected = Round15Queries.lineDedup(docs.toDF("doc_id", "text"))
      .select("doc_id", "kept_text", "n_lines", "n_kept")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val oneGot = new ConcurrentLinkedQueue[(Long, W)]()
    val oneStream = MemoryStream[(Long, String)](spark)
    val oneDir = java.nio.file.Files.createTempDirectory("corpus-lines-one").toString
    val oq = StreamingAggs.startCorpusPipeline(
      oneStream.toDF().toDF("doc_id", "text"), evalDocs,
      s"$oneDir/state", s"$oneDir/ckpt",
      batch => batch.select("doc_id", "text", "n_lines", "n_kept_lines")
        .collect().foreach(r => oneGot.add((r.getLong(0),
          (r.getString(1), r.getLong(2), r.getLong(3))))),
      lineScrub = true)
    try {
      oneStream.addData(docs: _*)
      oq.processAllAvailable()
    } finally oq.stop()
    val oneByDoc = oneGot.toArray(new Array[(Long, V)](0)).toMap
    docs.foreach { case (id, _) =>
      assert(oneByDoc(id) === expected(id),
        s"single-batch stream must equal batch d_line_dedup for doc $id: " +
          s"stream=${oneByDoc(id)} batch=${expected(id)}")
    }
  }

  test("R17/T4 streaming: newline line-scrub mode ≡ batch d_line_dedup_nl (ADVICE r17)") {
    // the streaming scrub hardcoded newlineSplit=false, so on genuine
    // newline-delimited corpora it cut arbitrary 3-token fragments while
    // the batch twin (d_line_dedup_nl) cut real lines — the plumbed
    // lineNewlineSplit flag must reproduce the batch operator exactly.
    // Newline-segmented bodies: the shared nav LINE (>2 docs ⇒ scrubbed)
    // is 3 tokens, each body line 6 distinct tokens (memory: tiny
    // post-scrub docs trip the small-denominator repetition dials).
    import graft.streaming.StreamingAggs
    import graft.operators.Round15Queries
    val nav = "home about contact"
    val docs: Seq[(Long, String)] = Seq(
      1L -> s"$nav\nalpha beta gamma delta epsilon zeta",
      2L -> s"eta theta iota kappa lambda mu\n$nav",
      3L -> s"$nav\nomega psi chi phi upsilon tau")
    type W = (String, Long, Long) // text, n_lines, n_kept_lines
    val expected = Round15Queries.lineDedup(docs.toDF("doc_id", "text"),
        newlineSplit = true)
      .select("doc_id", "kept_text", "n_lines", "n_kept")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // batch-mode sanity: nav is a LINE in all 3 docs ⇒ scrubbed everywhere
    assert(expected(1L) === (("alpha beta gamma delta epsilon zeta", 2L, 1L)))
    val got = new ConcurrentLinkedQueue[(Long, W)]()
    val stream = MemoryStream[(Long, String)](spark)
    val dir = java.nio.file.Files.createTempDirectory("corpus-lines-nl").toString
    val evalDocs = Seq("benchmark holdout grams live only here today").toDF("text")
    val q = StreamingAggs.startCorpusPipeline(
      stream.toDF().toDF("doc_id", "text"), evalDocs,
      s"$dir/state", s"$dir/ckpt",
      batch => batch.select("doc_id", "text", "n_lines", "n_kept_lines")
        .collect().foreach(r => got.add((r.getLong(0),
          (r.getString(1), r.getLong(2), r.getLong(3))))),
      lineScrub = true, lineNewlineSplit = true)
    try {
      stream.addData(docs: _*)
      q.processAllAvailable()
    } finally q.stop()
    val byDoc = got.toArray(new Array[(Long, W)](0)).toMap
    docs.foreach { case (id, _) =>
      assert(byDoc(id) === expected(id),
        s"newline-mode stream must equal batch d_line_dedup_nl for doc $id: " +
          s"stream=${byDoc(id)} batch=${expected(id)}")
    }
  }

  test("R19/T4 streaming: incremental vector index — serving stored codes ≡ the composed IVF-PQ plan") {
    import graft.streaming.StreamingAggs
    import graft.operators.SimilarityQueries
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("vec-index").toString
    graft.plans.GraftFunctions.register(spark)
    // the ivfpqSearch planted fixture: stride 4 ⇒ centroids {0,4,8,12}
    // on orthogonal axes, probe = id 0 = e1, probed cells {0, 4}
    def axis(i: Int, s: Double): Seq[Double] =
      Seq.tabulate(64)(j => if (j == i) s else 0.0)
    def mix2(a: (Int, Double), b: (Int, Double)): Seq[Double] =
      Seq.tabulate(64)(j => if (j == a._1) a._2 else if (j == b._1) b._2 else 0.0)
    val seed: Seq[(Long, Seq[Double])] = Seq(
      0L -> axis(0, 1.0), 4L -> axis(1, 1.0),
      8L -> axis(2, 1.0), 12L -> axis(3, 1.0),
      1L -> mix2(0 -> 0.9, 1 -> 0.1), 2L -> mix2(0 -> 0.1, 1 -> 0.8),
      3L -> axis(2, 0.1), 5L -> axis(2, 2.0), 6L -> axis(2, 3.0),
      7L -> axis(3, 2.0), 9L -> axis(3, 3.0), 10L -> axis(2, 4.0),
      11L -> axis(3, 4.0), 13L -> axis(2, 5.0), 14L -> axis(3, 5.0),
      15L -> axis(2, 6.0))
    // later arrivals (ids avoid ≡ 0 mod 4 so the quantizer is unchanged):
    // two land in probed cells, one in an unprobed cell
    val arrivals: Seq[(Long, Seq[Double])] = Seq(
      17L -> mix2(0 -> 0.7, 1 -> 0.2), 18L -> axis(1, 0.9),
      21L -> axis(2, 1.5), 22L -> mix2(0 -> 0.05, 1 -> 0.6))
    val stream = MemoryStream[(Long, Seq[Double])](spark)
    val q = StreamingAggs.startIncrementalVectorIndex(
      stream.toDF().toDF("vec_id", "v"), seed.toDF("vec_id", "v"),
      s"$dir/codes", s"$dir/ckpt", _ => (), centroidStride = 4)
    try {
      stream.addData(seed: _*)      // batch 0: backfill the seed corpus
      q.processAllAvailable()
      stream.addData(arrivals: _*)  // batch 1: live arrivals
      q.processAllAvailable()
    } finally q.stop()
    // serve an ADC top-10 from the STORED codes only — no vector column
    // anywhere on the corpus side — and demand bit-identical results to
    // the fully-composed in-plan query over the same union corpus
    import graft.functions.VectorFunctions.l2Norm
    val seedDf = seed.toDF("vec_id", "v").withColumn("nrm", l2Norm(col("v")))
    val (centArr, cb) = SimilarityQueries.pqIndexBuild(seedDf, 4)
    val served = SimilarityQueries.pqIndexServe(
      spark.read.parquet(s"$dir/codes").select("vec_id", "cell", "pq_code"),
      seed.toDF("vec_id", "v").filter(col("vec_id") === 0),
      centArr, cb)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val composed = SimilarityQueries.ivfpqSearch(
      (seed ++ arrivals).toDF("vec_id", "v"), centroidStride = 4, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(served === composed,
      s"stored-index serving diverged from the composed plan:\n  served=$served\n  composed=$composed")
    assert(served.map(_._1).toSet.intersect(Set(17L, 18L, 22L)) === Set(17L, 18L, 22L),
      s"live arrivals in probed cells must be servable: $served")
    assert(!served.map(_._1).contains(21L),
      s"an arrival homed in an unprobed cell leaked into serving: $served")

    // r14: the index-health loop closes IN-STREAM — the cell census runs
    // directly over the accumulating stored codes (the nightly monitor a
    // real ANN service schedules), and a flood of arrivals into one cell
    // flips the rebalance flag
    import org.apache.spark.sql.functions.{count, lit}
    def census() = SimilarityQueries.cellSkewCensus(
      spark.read.parquet(s"$dir/codes")
        .groupBy(col("cell")).agg(count(lit(1)).as("n_vecs")))
      .collect()
    val before = census()
    val byCell = before.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(before.head.getLong(2) === byCell.size.toLong) // n_cells
    assert(before.head.getLong(3) === byCell.values.max)  // max_n
    val sorted = byCell.values.toSeq.sorted
    val med2 = sorted((sorted.size - 1) / 2) + sorted(sorted.size / 2)
    assert(before.head.getLong(4) === med2)
    val rebalanceBefore = before.head.getBoolean(6)

    // flood cell 8 (axis-2 home) with 24 arrivals, then re-census: the
    // max/median ratio crosses 4 and the monitor demands a retrain
    val q2 = StreamingAggs.startIncrementalVectorIndex(
      stream.toDF().toDF("vec_id", "v"), seed.toDF("vec_id", "v"),
      s"$dir/codes", s"$dir/ckpt2", _ => (), centroidStride = 4)
    try {
      stream.addData((0 until 24).map(i =>
        (100L + i, axis(2, 1.0 + i * 0.1))): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val after = census()
    assert(after.head.getBoolean(6),
      s"flooded cell must trip the rebalance flag: ${after.mkString(";")}")
    assert(after.head.getLong(3) > before.head.getLong(3),
      "the flood must be visible as the new max cell")
    assert(!rebalanceBefore,
      "fixture premise: the pre-flood index is balanced under ratio 4")
  }

  test("R6/R17 streaming: snapshot-diff twin classifies against the running release head, batch ≡ stream") {
    import graft.streaming.StreamingAggs
    import org.apache.spark.sql.functions.{col, md5}
    val dir = java.nio.file.Files.createTempDirectory("snap-diff").toString
    val stateDir = s"$dir/state"
    // seed release (batch=-1 slice): docs 1 and 2 at their v1 texts
    val seedDocs = Seq((1L, "one v1"), (2L, "two v1"))
    seedDocs.toDF("doc_id", "text")
      .select(col("doc_id"), md5(col("text")).as("sha"))
      .write.parquet(s"$stateDir/batch=-1")
    val stream = MemoryStream[(Long, String)](spark)
    val got = new ConcurrentLinkedQueue[(Long, String, Long)]()
    val q = StreamingAggs.startIncrementalSnapshotDiff(
      stream.toDF().toDF("doc_id", "text"), stateDir, s"$dir/ckpt",
      b => b.select("doc_id", "status", "batch_id").collect()
        .foreach(r => got.add((r.getLong(0), r.getString(1), r.getLong(2)))))
    try {
      // batch 0: unchanged / changed / added against the seed
      stream.addData((1L, "one v1"), (2L, "two v2"), (3L, "three v1"))
      q.processAllAvailable()
      // batch 1: doc 2's v2 is now the head (unchanged), doc 3 changes
      // AGAIN, doc 4 arrives new
      stream.addData((2L, "two v2"), (3L, "three v2"), (4L, "four v1"))
      q.processAllAvailable()
    } finally q.stop()
    val byBatch = got.toArray(new Array[(Long, String, Long)](0))
      .groupBy(_._3).map { case (b, xs) =>
        b -> xs.map(x => x._1 -> x._2).toMap }
    assert(byBatch(0L) === Map(1L -> "unchanged", 2L -> "changed", 3L -> "added"),
      byBatch(0L).toString)
    assert(byBatch(1L) === Map(2L -> "unchanged", 3L -> "changed", 4L -> "added"),
      byBatch(1L).toString)

    // batch ≡ stream: the BATCH snapshot diff between the seed release
    // and the final corpus equals the per-doc fold of the stream's
    // verdicts (ever-added -> added: the doc was not in the release;
    // else ever-changed -> changed; else unchanged)
    val finalDocs = Seq((1L, "one v1"), (2L, "two v2"),
      (3L, "three v2"), (4L, "four v1"))
    val batchDiff = graft.operators.Round14Queries
      .snapshotDiff(seedDocs.toDF("doc_id", "text"), finalDocs.toDF("doc_id", "text"))
      .select("doc_id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val streamFold = got.toArray(new Array[(Long, String, Long)](0))
      .groupBy(_._1).map { case (d, xs) =>
        val ss = xs.map(_._2).toSet
        d -> (if (ss("added")) "added"
              else if (ss("changed")) "changed" else "unchanged") }
    assert(streamFold === batchDiff,
      s"stream fold $streamFold must equal batch diff $batchDiff")

    // the state head IS the final corpus: latest sha per doc matches md5
    // of the final texts
    val head = spark.read.parquet(stateDir)
      .select(col("doc_id"), col("sha"), col("batch"))
      .collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.maxBy(_.getAs[Int]("batch")).getString(1) }
    val expected = finalDocs.toDF("doc_id", "text")
      .select(col("doc_id"), md5(col("text")).as("sha"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(head === expected, s"state head $head != final corpus $expected")

    // replay (post-append-pre-commit crash shape): re-delivering batch 0
    // on a fresh checkpoint re-marks identically — its own batch=0 slice
    // is excluded from the head read — and the state table is unchanged
    val preCount = spark.read.parquet(stateDir).count()
    val stream2 = MemoryStream[(Long, String)](spark)
    val got2 = new ConcurrentLinkedQueue[(Long, String)]()
    val q2 = StreamingAggs.startIncrementalSnapshotDiff(
      stream2.toDF().toDF("doc_id", "text"), stateDir, s"$dir/ckpt-replay",
      b => b.select("doc_id", "status").collect()
        .foreach(r => got2.add((r.getLong(0), r.getString(1)))))
    try {
      stream2.addData((1L, "one v1"), (2L, "two v2"), (3L, "three v1"))
      q2.processAllAvailable()
    } finally q2.stop()
    val replayed = got2.toArray(new Array[(Long, String)](0)).toMap
    // doc 3's head on replay is batch=1's v2 (a LATER batch already
    // committed), so the v1 re-delivery reads as changed — replay after
    // subsequent commits re-classifies against the CURRENT head, which
    // is the correct at-least-once readout; docs 1 and 2 reproduce
    assert(replayed === Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed"),
      replayed.toString)
    assert(spark.read.parquet(stateDir).count() === preCount,
      "replay must not grow the state table")
  }

  test("T4 streaming: a crash BETWEEN state-family commits replays into identical state across ALL families (VERDICT r17 #8)") {
    // The corpus pipeline commits five state families per batch in order:
    // neardup shingles → neardup bands → sha → mix → pack → lines. The
    // single-family replay pins above re-deliver a batch against its OWN
    // committed slice; this one injects a crash MID-COMMIT — after sha
    // and mix landed for batch 1 but before pack and lines — so the
    // replayed batch faces a MIXED state: some families already hold its
    // batch=1 slice (own-slice exclusion must hide them on read, then
    // rewrite them identically), others don't (the replay must create
    // them). A real restart drives it: a file source + the SAME
    // checkpoint re-delivers the failed batch as batchId 1, exactly the
    // production crash shape. The end state must be byte-equal
    // (family-by-family set-equal) to a never-crashed run of the same
    // two batches.
    import graft.streaming.StreamingAggs
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val root = java.nio.file.Files.createTempDirectory("corpus-multifault").toString
    val srcDir = s"$root/src"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    val evalDocs = Seq("benchmark holdout grams live only here today").toDF("text")
    val baseText = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
    val crossDup = baseText.replace("alpha ", "yankee ") // proven J >= 0.5 pair
    def doc(i: Int): String = (0 until 20).map(j => s"fi${i}q$j").mkString(" ")
    val b0 = Seq((1L, doc(1), "src0"), (2L, baseText, "src0"), (3L, doc(3), "src1"))
    val b1 = Seq((5L, doc(5), "src0"), (6L, doc(1), "src1"), // 6 = exact dup of 1
      (7L, crossDup, "src0"),                                // near-dup of accepted 2
      (8L, doc(8), "src1"))
    def writeJson(name: String, rows: Seq[(Long, String, String)]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$srcDir/$name"),
        rows.map(r => s"""{"doc_id":${r._1},"text":"${r._2}","source":"${r._3}"}""")
          .mkString("\n"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("source", StringType)))
    type V = (Boolean, Boolean, Boolean) // is_new, is_neardup, accepted
    @volatile var failPack = false
    def startP(state: String, ckpt: String, got: ConcurrentLinkedQueue[(Long, V)],
               inject: Boolean) =
      StreamingAggs.startCorpusPipeline(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).json(srcDir),
        evalDocs, state, ckpt,
        batch => batch.select("doc_id", "is_new", "is_neardup", "accepted")
          .collect().foreach(r => got.add((r.getLong(0),
            (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))))),
        sourceMix = true, packSequences = true, lineScrub = true,
        onPacked = p => {
          p.count() // consume like a real downstream
          if (inject && failPack)
            throw new RuntimeException("injected crash between mix and pack commits")
        })
    // ---- faulted run: batch 0 clean, batch 1 dies mid-commit ----
    val got0 = new ConcurrentLinkedQueue[(Long, V)]()
    writeJson("b0.json", b0)
    val q0 = startP(s"$root/state", s"$root/ckpt", got0, inject = true)
    val failure = try {
      q0.processAllAvailable() // batch 0 commits all five families
      failPack = true
      writeJson("b1.json", b1)
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q0.processAllAvailable()
      }
    } finally { try q0.stop() catch { case _: Exception => () } }
    assert(failure.getMessage.contains("injected crash"), failure.getMessage)
    failPack = false
    // the partial-commit shape: neardup + sha + mix landed for batch 1,
    // pack + lines did not — the exact mid-commit kill
    def slice(family: String): java.nio.file.Path =
      java.nio.file.Paths.get(s"$root/state/$family/batch=1")
    Seq("neardup/shingles", "neardup/bands", "sha", "mix").foreach(f =>
      assert(java.nio.file.Files.isDirectory(slice(f)),
        s"$f batch=1 must have committed before the injected crash"))
    Seq("pack", "lines").foreach(f =>
      assert(!java.nio.file.Files.exists(slice(f)),
        s"$f batch=1 must NOT have committed after the injected crash"))
    val attempt1 = got0.toArray(new Array[(Long, V)](0)).toMap
    // non-vacuous fixture: the exact-dup and near-dup verdicts fired
    assert(attempt1(6L) === ((false, false, false)), attempt1(6L).toString)
    assert(attempt1(7L) === ((true, true, false)), attempt1(7L).toString)
    // ---- restart from the SAME checkpoint: batch 1 replays as id 1 ----
    val got1 = new ConcurrentLinkedQueue[(Long, V)]()
    val q1 = startP(s"$root/state", s"$root/ckpt", got1, inject = false)
    try q1.processAllAvailable() finally q1.stop()
    val replayed = got1.toArray(new Array[(Long, V)](0)).toMap
    assert(replayed.keySet === b1.map(_._1).toSet,
      s"the restart must replay exactly the failed batch: ${replayed.keySet}")
    b1.map(_._1).foreach { id =>
      assert(replayed(id) === attempt1(id),
        s"replay verdict for doc $id diverged: ${replayed(id)} vs ${attempt1(id)}")
    }
    // ---- never-crashed reference run, same two-file cadence ----
    val gotC = new ConcurrentLinkedQueue[(Long, V)]()
    val qC = startP(s"$root/stateClean", s"$root/ckptClean", gotC, inject = false)
    try qC.processAllAvailable() finally qC.stop()
    // every family's final content is identical, slice-for-slice
    def family(state: String, family: String, cols: Seq[String]): Set[Seq[Any]] =
      spark.read.parquet(s"$root/$state/$family")
        .select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toSeq).toSet
    Seq(
      ("sha", Seq("content_sha", "batch")),
      ("neardup/shingles", Seq("doc_id", "batch")),
      ("neardup/bands", Seq("doc_id", "band", "h", "batch")),
      ("mix", Seq("source", "src_tokens", "batch")),
      ("pack", Seq("shard", "shard_tokens", "batch")),
      ("lines", Seq("lh", "ndocs", "batch"))).foreach { case (f, cols) =>
      assert(family("state", f, cols) === family("stateClean", f, cols),
        s"state family $f diverged between the crashed+replayed run and the clean run")
    }
  }
}
