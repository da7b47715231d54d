package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** A custom Structured Streaming source over an ordinal-ordered segment
  * log — the faithful DataSourceV2 analog of the reference's RabbitMQ
  * stream subscription (SURVEY.md §2.1 S1; reference/app/app.py:564-583).
  *
  * The log is a directory of append-only TSV segments
  * (`ordinal \t ts_ms \t body` per line, `*.log`); segments play the
  * broker's retention units. The source exposes the reference's consumer
  * contract natively:
  *
  *   - **Offsets are ordinals** (broker offsets, app.py:404-407): the
  *     streaming Offset is "last delivered ordinal", so Spark's
  *     checkpointed offset tracking IS the reference's replay cursor.
  *   - **Seek modes** (S2-S5, app.py:222-271) via options:
  *     `startingOrdinal` (ordinal ≥ n), `startingTimestamp` (first
  *     ordinal with broker ts ≥ ms), or `startingOffsets` =
  *     `earliest` | `latest` (NEXT, the reference default).
  *   - **Backpressure** (T6): `maxOrdinalsPerTrigger` through
  *     [[SupportsAdmissionControl]] — the engine-side
  *     `maxOffsetsPerTrigger` analog.
  *   - **Per-stream total order** (T1, README.md:168-179): each micro
  *     batch is ONE input partition, rows sorted by ordinal. Parallelism
  *     lives across streams (one query per stream), exactly like the
  *     reference's one-consumer-per-stream model.
  *
  * Scale notes: sink-written segments carry their ordinal bounds in the
  * FILE NAME (`.o<min>-<max>.log`, Kafka-index style), and every bounded
  * read — pushed batch predicates (GraftLogScanBuilder) and streaming
  * micro-batch ranges alike — skips non-intersecting segments without
  * opening them (GraftLog.readRange). `latestOffset` reduces to a
  * directory listing when every segment carries name bounds, and falls
  * back to a scan when any is unmarked. BATCH scans additionally split
  * one InputPartition per marked segment (pruned at plan time by the
  * pushed ordinal window), so a retention-archive replay parallelizes
  * across the cluster instead of running as one task; per-batch total
  * order remains the streaming contract only.
  */
object GraftLog {
  val Schema: StructType = StructType(Seq(
    StructField("body", StringType),
    StructField("ordinal", LongType),
    StructField("ts_ms", LongType)))

  /** The record framing is line + tab based, so bodies must not carry raw
    * newlines/CRs (they would split records) — escape on write, reverse on
    * read. Backslash escapes first so the mapping is bijective; tab is
    * escaped too for symmetry even though `split("\t", 3)` would tolerate
    * it.
    */
  private[sources] def escapeBody(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t")
      .replace("\n", "\\n").replace("\r", "\\r")

  private[sources] def unescapeBody(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => sb.append('\\'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case _    => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Producer-side fixture (S8 analog): append one TSV segment. */
  def writeSegment(dir: String, name: String, rows: Seq[(Long, Long, String)]): Unit = {
    Files.createDirectories(Paths.get(dir))
    val content = rows.map { case (ord, ts, body) => s"$ord\t$ts\t${escapeBody(body)}" }.mkString("\n")
    Files.write(Paths.get(dir, s"$name.log"), content.getBytes(StandardCharsets.UTF_8))
  }

  private[sources] def segmentFiles(dir: String): Seq[Path] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      // Files.list holds the directory fd until closed; this runs per
      // trigger (latestOffset) and per partition read, so an unclosed
      // stream leaks one fd per micro-batch until GC (EMFILE risk on a
      // long-running query). Materialize then close.
      val s = Files.list(p)
      try s.iterator().asScala.filter(_.toString.endsWith(".log")).toSeq.sortBy(_.toString)
      finally s.close()
    }
  }

  /** Segment-name metadata: the SINK embeds each segment's ordinal bounds
    * in the file name (`…​.o<min>-<max>.log`) — the Kafka-index analog that
    * lets a bounded read SKIP whole segments without opening them.
    * Segments without the marker (e.g. plain writeSegment fixtures) have
    * unknown bounds and are always read.
    */
  private val BoundsRe = """.*\.o(-?\d+)-(-?\d+)\.log$""".r

  /** Name-embedded (min, max) ordinal bounds, if the segment carries them. */
  private[sources] def nameBounds(f: Path): Option[(Long, Long)] =
    f.toString match {
      case BoundsRe(mn, mx) => Some((mn.toLong, mx.toLong))
      case _ => None
    }

  /** Observability hook for specs: counts segment FILES actually opened. */
  private[graft] val filesOpened = new java.util.concurrent.atomic.AtomicLong(0L)

  private def parseSegment(f: Path): Seq[(Long, Long, String)] = {
    filesOpened.incrementAndGet()
    Files.readAllLines(f, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty)
      .map { line =>
        val Array(ord, ts, body) = line.split("\t", 3)
        (ord.toLong, ts.toLong, unescapeBody(body))
      }
  }

  /** (ordinal, ts_ms, body) of every record currently in the log. */
  private[sources] def readAll(dir: String): Seq[(Long, Long, String)] =
    segmentFiles(dir).flatMap(parseSegment)

  /** Range read with segment skipping: segments whose name-embedded bounds
    * fall outside (fromExclusive, toInclusive] are never opened; unmarked
    * segments are read and row-filtered. At 100 TB this is the difference
    * between touching the replay window and touching the whole retention
    * archive.
    */
  private[sources] def readRange(dir: String, fromExclusive: Long,
                                 toInclusive: Long): Seq[(Long, Long, String)] =
    segmentFiles(dir).filter { f =>
      nameBounds(f) match {
        case Some((mn, mx)) => mx > fromExclusive && mn <= toInclusive
        case None => true // no metadata — must read
      }
    }.flatMap(parseSegment)
      .filter(t => t._1 > fromExclusive && t._1 <= toInclusive)

  /** Read ONLY the named segment files, row-filtered to the range — the
    * per-partition read for segment-split batch scans (each task touches
    * exactly its own segments, never the whole directory).
    */
  private[sources] def readFiles(files: Seq[String], fromExclusive: Long,
                                 toInclusive: Long): Seq[(Long, Long, String)] =
    files.map(Paths.get(_)).filter(Files.exists(_)).flatMap(parseSegment)
      .filter(t => t._1 > fromExclusive && t._1 <= toInclusive)

  /** Retention expiry (reference README.md:222-237: stream data expires
    * after the retention window; consumers seeking below it get the first
    * available message). Deletes segment FILES whose every record sits
    * strictly below the ordinal watermark; a segment straddling the
    * watermark is kept WHOLE — expiry never splits a segment, exactly a
    * log broker's segment-granular retention. Reads that land below the
    * new tail then deliver first-available via the ordinary range scan:
    * no special clamp code path, the expired rows simply do not exist.
    *
    * Bounds come from the name when embedded (no file open); an unmarked
    * segment is opened once to learn its max. An empty segment holds no
    * records, so deleting it never loses data. Driver-side maintenance
    * op: one directory listing plus one read per unmarked candidate —
    * never a data-plane scan. Returns deleted segment file names.
    */
  def expireBelowOrdinal(dir: String, watermarkExclusive: Long): Seq[String] =
    segmentFiles(dir).filter { f =>
      nameBounds(f) match {
        case Some((_, mx)) => mx < watermarkExclusive
        case None =>
          val rows = parseSegment(f)
          rows.isEmpty || rows.map(_._1).max < watermarkExclusive
      }
    }.map { f => Files.delete(f); f.getFileName.toString }

  /** Timestamp flavor of [[expireBelowOrdinal]] — "older than N days"
    * retention. Segment names embed ordinal bounds only, so every segment
    * is opened once to learn its newest broker timestamp; acceptable for
    * a rarely-run maintenance sweep (embedding ts bounds in sink names is
    * the optimization if expiry ever becomes hot).
    */
  def expireOlderThan(dir: String, tsWatermarkMs: Long): Seq[String] =
    segmentFiles(dir).filter { f =>
      val rows = parseSegment(f)
      rows.isEmpty || rows.map(_._2).max < tsWatermarkMs
    }.map { f => Files.delete(f); f.getFileName.toString }

  /** Per-segment (min, max) ordinal bounds: from the name when embedded
    * (no file open), else by opening THAT segment only — one unmarked
    * fixture segment must not force a full-log read on the per-trigger
    * driver path (code-review r17; previously any unmarked file demoted
    * [[maxOrdinal]] to readAll over every segment). Empty segments
    * contribute no bounds.
    */
  private def fileBounds(f: Path): Option[(Long, Long)] =
    nameBounds(f).orElse {
      val ords = parseSegment(f).map(_._1)
      if (ords.isEmpty) None else Some((ords.min, ords.max))
    }

  private[graft] def maxOrdinal(dir: String): Long =
    segmentFiles(dir).flatMap(fileBounds).map(_._2)
      .maxOption.getOrElse(-1L)

  /** Smallest ordinal currently in the log; 0 when empty (the earliest
    * cursor then rests at −1, the pre-fix behavior for an empty log).
    */
  private[graft] def minOrdinal(dir: String): Long =
    segmentFiles(dir).flatMap(fileBounds).map(_._1)
      .minOption.getOrElse(0L)
}

/** Streaming offset = last delivered ordinal. */
case class GraftLogOffset(ord: Long) extends Offset {
  override def json: String = s"""{"ord":$ord}"""
}

object GraftLogOffset {
  def fromJson(json: String): GraftLogOffset =
    GraftLogOffset("""-?\d+""".r.findFirstIn(json).map(_.toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad offset: $json")))
}

/** Entry point: `spark.readStream.format(classOf[GraftLogProvider].getName)`. */
class GraftLogProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GraftLog.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new GraftLogTable
}

class GraftLogTable extends Table with SupportsRead with SupportsWrite {
  override def name(): String = "graft-log"
  override def schema(): StructType = GraftLog.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE)

  /** Producer side (S8, the ampq_publisher analog): executors append TSV
    * segments directly — each task streams its rows to a `.log.tmp` file
    * and atomically renames to `.log` on task commit, so readers (which
    * only pick up `*.log`) never observe partial segments and an aborted
    * task leaves no visible data. No driver-side funnel: at 100 TB every
    * executor publishes its own segments, exactly how a partitioned broker
    * ingests. Ordinals travel IN the rows (the log's contract — readers
    * order by ordinal), so parallel writers need no coordination.
    */
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val dir = Option(info.options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-log sink needs option 'path'"))
    val names = info.schema().fields.map(_.name).toSeq
    require(names == Seq("body", "ordinal", "ts_ms"),
      s"graft-log sink needs columns (body, ordinal, ts_ms); got $names")
    // queryId is stable across restarts of the SAME streaming query (it
    // lives in the checkpoint), so epoch-replay replaces its own segments;
    // 16 sanitized chars of the UUID (64 bits) keep distinct queries
    // sharing a dir from colliding.
    val qid = Option(info.queryId()).map(_.replaceAll("[^0-9a-zA-Z]", "").take(16))
      .filter(_.nonEmpty).getOrElse("q")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new GraftLogBatchWrite(dir)
        override def toStreaming: StreamingWrite = new GraftLogStreamingWrite(dir, qid)
      }
    }
  }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftLogScanBuilder(options)
}

/** Batch-scan builder with ORDINAL predicate pushdown (the replay-window
  * seek, S2-S5, as a DSv2 `SupportsPushDownFilters`): range/equality
  * filters on `ordinal` tighten the scan's (fromExclusive, toInclusive]
  * window, which both row-filters exactly (the accepted filters need no
  * re-evaluation) and SKIPS whole segments via the name-embedded bounds —
  * the custom-source twin of parquet min/max row-group pruning. Filters on
  * other columns are left to Spark (returned as residuals).
  */
class GraftLogScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private var fromEx = Long.MinValue
  private var toInc = Long.MaxValue
  private var accepted = Array.empty[Filter]

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // v - 1 must not wrap: GreaterThanOrEqual(Long.MinValue) is a
    // tautology (accept, no bound change), LessThan(Long.MinValue) is
    // always-false (empty range: (MinValue, MinValue] admits nothing),
    // and EqualTo(Long.MinValue) cannot be expressed with an exclusive
    // lower bound — leave it to Spark as a residual.
    def handle(f: Filter): Boolean = f match {
      case GreaterThan("ordinal", v: Long)        => fromEx = math.max(fromEx, v); true
      case GreaterThanOrEqual("ordinal", v: Long) =>
        if (v != Long.MinValue) fromEx = math.max(fromEx, v - 1); true
      case LessThan("ordinal", v: Long) =>
        toInc = math.min(toInc, if (v == Long.MinValue) Long.MinValue else v - 1); true
      case LessThanOrEqual("ordinal", v: Long)    => toInc = math.min(toInc, v); true
      case EqualTo("ordinal", v: Long) if v != Long.MinValue =>
        fromEx = math.max(fromEx, v - 1); toInc = math.min(toInc, v); true
      case _ => false
    }
    val (ok, residual) = filters.partition(handle)
    accepted = ok
    residual
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = accepted

  override def build(): Scan = new Scan {
    override def readSchema(): StructType = GraftLog.Schema
    // The streaming stream receives the pushed bounds too: Spark's pushdown
    // rule runs before the scan knows its mode, and a builder that ACCEPTS a
    // filter promises to apply it — silently ignoring it on one path would
    // deliver rows the query filtered out (the micro-batch clamps its
    // delivered range instead).
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new GraftLogMicroBatch(options, fromEx, toInc)
    // dual-mode like Kafka: the same log is a bounded batch table (the
    // retention-archive replay twin, SURVEY.md §2.1 S10)
    override def toBatch: Batch = new Batch {
      private val dir = Option(options.get("path")).getOrElse(
        throw new IllegalArgumentException("graft-log source needs option 'path'"))
      /** One InputPartition PER bounds-marked segment intersecting the pushed
        * ordinal window — a multi-TB retention-archive replay parallelizes
        * across the cluster instead of running as one task. Non-intersecting
        * marked segments are pruned at PLAN time (never opened); unmarked
        * segments (plain writeSegment fixtures, unknown bounds) are grouped
        * into one fallback partition since nothing orders them. Batch mode
        * makes no ordering promise — T1's total order is the STREAMING
        * contract (one partition per micro-batch); batch consumers re-order
        * by `ordinal` when they need it, which Spark parallelizes as a
        * range-partitioned sort.
        */
      override def planInputPartitions(): Array[InputPartition] = {
        val files = GraftLog.segmentFiles(dir)
        val (marked, unmarked) = files.partition(f => GraftLog.nameBounds(f).isDefined)
        val perSegment: Seq[InputPartition] = marked
          .filter { f =>
            val (mn, mx) = GraftLog.nameBounds(f).get
            mx > fromEx && mn <= toInc
          }
          .map(f => GraftLogSegments(Seq(f.toString), fromEx, toInc))
        val fallback: Seq[InputPartition] =
          if (unmarked.nonEmpty) Seq(GraftLogSegments(unmarked.map(_.toString), fromEx, toInc))
          else Nil
        (perSegment ++ fallback).toArray
      }
      override def createReaderFactory(): PartitionReaderFactory = GraftLogReaderFactory
    }
    override def description(): String =
      s"graft-log PushedOrdinalRange: ($fromEx, $toInc]"
  }
}

class GraftLogMicroBatch(options: CaseInsensitiveStringMap,
                         pushedFromEx: Long = Long.MinValue,
                         pushedToInc: Long = Long.MaxValue)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val dir = Option(options.get("path")).getOrElse(
    throw new IllegalArgumentException("graft-log source needs option 'path'"))
  // Stream-existence check at subscribe time (the reference probes
  // consumer.stream_exists and closes 1013 when the stream is missing,
  // reference/app/app.py:311-318). Without it a typo'd path silently
  // becomes an empty log that delivers nothing forever. `allowMissing=true`
  // opts back into the lenient behavior for logs created after subscribe.
  if (!Option(options.get("allowMissing")).exists(_.toBoolean) &&
      !Files.isDirectory(Paths.get(dir)))
    throw new IllegalArgumentException(
      s"1013: stream does not exist: $dir (set allowMissing=true to subscribe to a not-yet-created log)")
  private val startOrdinal = Option(options.get("startingOrdinal")).map(_.toLong)
  private val startTimestamp = Option(options.get("startingTimestamp")).map(_.toLong)
  // value validated case-insensitively: CaseInsensitiveStringMap folds
  // KEYS only, and a typo'd/"LATEST" value silently falling through to
  // earliest would replay the whole retention archive — the reference's
  // S6 contract errors loudly on a bad offset specification
  // (code-review r17)
  private val startMode = Option(options.get("startingOffsets"))
    .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("earliest")
  require(startMode == "earliest" || startMode == "latest",
    s"startingOffsets must be 'earliest' or 'latest', got '$startMode' " +
      "(reference S6: a bad offset specification is a loud error, WS close 1002)")
  private val maxPerTrigger = Option(options.get("maxOrdinalsPerTrigger")).map(_.toLong)
  // 0/negative would make latestOffset cap the cursor at `from` every
  // trigger — zero progress forever with no error (code-review r17)
  require(maxPerTrigger.forall(_ > 0),
    s"maxOrdinalsPerTrigger must be positive, got ${maxPerTrigger.getOrElse(0L)}")
  require(Seq(startOrdinal.isDefined, startTimestamp.isDefined).count(identity) <= 1,
    "at most one of startingOrdinal / startingTimestamp (reference S6: WS close 1002)")

  // S2-S5 — the consumer offset specification (app.py:226-266)
  override def initialOffset(): Offset = {
    val firstDeliverable: Long = (startOrdinal, startTimestamp) match {
      case (Some(n), _) => n // ordinal ≥ n (0 ⇒ from first; README.md:200-203)
      case (_, Some(ts)) => // first record with broker timestamp ≥ ts
        // No currently-matching record ⇒ NEXT semantics (maxOrdinal+1),
        // NOT Long.MaxValue: a broker TIMESTAMP seek still delivers
        // records that arrive later with ts ≥ the requested point, so the
        // cursor must rest at the log head, not pin the stream shut.
        GraftLog.readAll(dir).filter(_._2 >= ts).map(_._1)
          .minOption.getOrElse(GraftLog.maxOrdinal(dir) + 1)
      case _ if startMode == "latest" => GraftLog.maxOrdinal(dir) + 1 // NEXT
      // earliest = the log's actual minimum, not a literal 0: the data
      // model supports negative ordinals (BoundsRe, the offset JSON, the
      // pushdown guards all handle them) and a hardcoded 0 silently
      // skipped any such records (code-review r17); for an ordinary ≥1
      // log, min−1 delivers exactly what the old 0−1 cursor did
      case _ => GraftLog.minOrdinal(dir) // earliest
    }
    GraftLogOffset(firstDeliverable - 1)
  }

  override def getDefaultReadLimit: ReadLimit =
    maxPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("admission-control path is used")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftLogOffset].ord
    val avail = GraftLog.maxOrdinal(dir)
    val capped = limit match {
      case r: ReadMaxRows =>
        // saturating add: a huge cap (or epoch-millis-scale ordinals)
        // must not wrap `from + maxRows` negative — the min() would then
        // pin the cursor at `from` forever, a silent stall
        // (code-review r17)
        val cap = try Math.addExact(from, r.maxRows())
                  catch { case _: ArithmeticException => Long.MaxValue }
        math.min(cap, avail)
      case _ => avail
    }
    GraftLogOffset(math.max(from, capped))
  }

  // ONE partition per batch: the stream's total-order contract (T1). The
  // delivered range is CLAMPED to any ordinal bounds the scan builder
  // accepted at pushdown time — offsets still track the log head (the
  // cursor is the consumer's position, not the filter), but rows outside
  // the accepted predicate are exactly the rows it promised to drop.
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array(GraftLogRange(dir,
      math.max(start.asInstanceOf[GraftLogOffset].ord, pushedFromEx),
      math.min(end.asInstanceOf[GraftLogOffset].ord, pushedToInc)))

  override def createReaderFactory(): PartitionReaderFactory = GraftLogReaderFactory

  override def deserializeOffset(json: String): Offset = GraftLogOffset.fromJson(json)
  override def commit(end: Offset): Unit = () // retention is the log's concern (T2)
  override def stop(): Unit = ()
}

case class GraftLogRange(dir: String, fromExclusive: Long, toInclusive: Long)
  extends InputPartition

/** Batch partition: an explicit segment-file list (usually ONE marked
  * segment; the unmarked-fixture fallback carries several). The task reads
  * only its own files — no per-task directory listing, no double-reads.
  */
case class GraftLogSegments(files: Seq[String], fromExclusive: Long, toInclusive: Long)
  extends InputPartition

/** Commit message: where the task staged its lines and where the segment
  * must be published. Carrying both paths lets the DRIVER do the publish
  * in BatchWrite/StreamingWrite.commit — two-phase commit, so a failed job
  * leaves no visible segments and abort can clean every staged file.
  */
private[graft] case class GraftLogSegMessage(tmpPath: String, finalPath: String)
  extends WriterCommitMessage

/** Task-side segment writer: stream lines to a tmp file unique to THIS
  * attempt (`tmpTag` carries the taskId — concurrent speculative/zombie
  * attempts of the same task must never share an inode or delete each
  * other's staging file). The task does NOT publish: its commit message
  * names the staged file, and the job-level commit renames everything at
  * once (atomic per file on a POSIX dir; on an object store this becomes
  * the usual staged-multipart + manifest commit). Empty tasks publish
  * nothing. Bodies are newline-escaped on write (GraftLog.escapeBody) so
  * arbitrary DataFrame content cannot corrupt the line framing. Null
  * ordinals/timestamps are data errors and fail loudly — getLong on a
  * null field would silently fabricate ordinal 0 and corrupt the log's
  * replay-cursor contract.
  */
private class GraftLogDataWriter(dir: String, segName: String, tmpTag: String)
    extends DataWriter[InternalRow] {
  private val tmp = Paths.get(dir, s"$segName.log.$tmpTag.tmp")
  private var out: java.io.BufferedWriter = _
  private var first = true
  private var mn = Long.MaxValue
  private var mx = Long.MinValue

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(1) && !row.isNullAt(2),
      "graft-log sink: ordinal and ts_ms must be non-null")
    if (out == null) {
      Files.createDirectories(Paths.get(dir))
      out = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
    }
    if (!first) out.write("\n")
    first = false
    val ord = row.getLong(1)
    if (ord < mn) mn = ord
    if (ord > mx) mx = ord
    val body = if (row.isNullAt(0)) "" else row.getUTF8String(0).toString
    out.write(s"$ord\t${row.getLong(2)}\t${GraftLog.escapeBody(body)}")
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) {
      out.close()
      // segment bounds ride in the FINAL name (`.o<min>-<max>.log`) — the
      // Kafka-index analog GraftLog.readRange prunes on; a replayed
      // streaming epoch rewrites identical data, hence the identical name
      GraftLogSegMessage(tmp.toString,
        Paths.get(dir, s"$segName.o$mn-$mx.log").toString)
    } else GraftLogSegMessage("", "")
  }

  override def abort(): Unit = {
    if (out != null) { out.close(); Files.deleteIfExists(tmp) }
  }

  override def close(): Unit = ()
}

/** Driver-side publish shared by batch and streaming commit: rename every
  * staged file to its final name. REPLACE is safe — batch names embed a
  * per-job tag (only this job's own earlier attempt can collide) and
  * streaming names are (query, epoch, partition)-stable (a replayed epoch
  * REPLACES its own segment — idempotent).
  */
private object GraftLogPublish {
  def commitAll(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftLogSegMessage(tmp, fin) if tmp.nonEmpty =>
        Files.move(Paths.get(tmp), Paths.get(fin),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      case _ => ()
    }
  def abortAll(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case GraftLogSegMessage(tmp, _) if tmp.nonEmpty =>
        Files.deleteIfExists(Paths.get(tmp))
      case _ => ()
    }
}

/** Serializable factory shipped to executors (must not capture the Write). */
private case class GraftLogWriterFactory(dir: String, tag: String)
    extends DataWriterFactory with StreamingDataWriterFactory {
  // batch: the final name embeds the per-JOB tag + task id, so re-running
  // another append job against the same dir appends new segments instead
  // of silently replacing old ones (task ids restart in a fresh JVM)
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftLogDataWriter(dir, s"seg-$tag-$partitionId-$taskId", taskId.toString)
  // streaming: final name is (query, epoch, partition)-stable — a replayed
  // epoch of the same query REPLACEs its own segment (idempotent), while
  // the attempt-unique tmpTag keeps concurrent attempts from colliding
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new GraftLogDataWriter(dir, s"seg-$tag-e$epochId-$partitionId", taskId.toString)
}

private class GraftLogBatchWrite(dir: String) extends BatchWrite {
  // driver-side per-job tag: keeps this job's segments disjoint from any
  // earlier run's (append semantics) while staying stable for its own
  // task retries
  private val jobTag = "b" + java.util.UUID.randomUUID().toString.replace("-", "").take(8)
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    GraftLogWriterFactory(dir, jobTag)
  // two-phase: segments become visible only if the whole JOB commits — a
  // task that failed after others succeeded leaves nothing published
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    GraftLogPublish.commitAll(messages)
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    GraftLogPublish.abortAll(messages)
}

/** Streaming epochs name segments by (queryId, epochId, partition), so a
  * replayed epoch (failure before the driver recorded the batch)
  * overwrites rather than duplicates — the same idempotence trick as
  * file-sink epoch manifests — and distinct queries sharing a dir never
  * collide.
  */
private[graft] class GraftLogStreamingWrite(dir: String, queryTag: String) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    GraftLogWriterFactory(dir, queryTag)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    // Epoch-replay idempotence must not depend on the replay using the
    // SAME partitioning (a restart can repartition the same offset range
    // differently, producing different segment names): before publishing,
    // drop every previously-published segment of THIS query+epoch that the
    // committed set does not supersede — the epoch's content is then
    // exactly this commit's files, replayed or not.
    val finals = messages.collect {
      case GraftLogSegMessage(tmp, fin) if tmp.nonEmpty =>
        Paths.get(fin).getFileName.toString
    }.toSet
    // PUBLISH first, then drop the stale names: deleting before the
    // renames opened a window where a concurrent reader of the shared
    // dir saw the epoch's rows missing entirely and could advance its
    // checkpoint past them (permanent loss); publish-then-delete shrinks
    // the hazard to transient duplicates in the overlap, which
    // at-least-once delivery already tolerates (code-review r17).
    // Same-name replacements are handled by commitAll's REPLACE_EXISTING
    // move and are excluded from the stale set below.
    GraftLogPublish.commitAll(messages)
    val prefix = s"seg-$queryTag-e$epochId-"
    GraftLog.segmentFiles(dir)
      .filter(f => f.getFileName.toString.startsWith(prefix) &&
        !finals.contains(f.getFileName.toString))
      .foreach(Files.deleteIfExists(_))
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftLogPublish.abortAll(messages)
}

object GraftLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = (partition match {
      // streaming micro-batch: whole-directory range read with name-bounds
      // segment skipping — ONE partition per batch (T1 total order)
      case r: GraftLogRange =>
        GraftLog.readRange(r.dir, r.fromExclusive, r.toInclusive)
      // batch: this task's own segment file(s) only
      case s: GraftLogSegments =>
        GraftLog.readFiles(s.files, s.fromExclusive, s.toInclusive)
    })
      .sortBy(_._1) // ordinal order within the partition (T1 for streaming)
      .iterator
    new PartitionReader[InternalRow] {
      private var current: (Long, Long, String) = _
      override def next(): Boolean = { val h = rows.hasNext; if (h) current = rows.next(); h }
      override def get(): InternalRow = new GenericInternalRow(
        Array[Any](UTF8String.fromString(current._3), current._1, current._2))
      override def close(): Unit = ()
    }
  }
}
