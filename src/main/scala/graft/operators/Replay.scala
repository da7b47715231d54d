package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Replay / seek semantics (SURVEY.md §2.1 S2-S5, §2.3 R6/R10/R11).
  *
  * The reference lets a consumer start from NEXT, an ordinal, an epoch-millis
  * timestamp, or a parsed datetime string (reference/app/app.py:215-278,
  * README.md:187-220) — a sum type `OffsetSpec` here. In batch these are
  * ordinary range predicates on the ordinal / timestamp axis, which Catalyst
  * pushes into the parquet scan (min/max row-group pruning at scale); in
  * streaming they map onto the source's startingOffsets.
  *
  * First-message-ordinal convention: ordinal seek delivers the first message
  * with ordinal >= the requested one; `stream_from_ordinal=0` therefore
  * yields the whole stream (README.md:200-203). Timestamp seek delivers the
  * first message with broker timestamp >= the given epoch millis
  * (reference/app/app.py:256-266).
  */
object Replay {

  /** Offset specification sum type (reference/app/app.py:226-266). */
  sealed trait OffsetSpec
  case object Next                           extends OffsetSpec
  final case class FromOrdinal(n: Long)      extends OffsetSpec
  final case class FromTimestamp(ms: Long)   extends OffsetSpec
  final case class FromDatetime(s: String)   extends OffsetSpec

  /** S6 — seek-param mutual exclusion (reference/app/app.py:222-278): at most
    * one seek parameter may be supplied; >1 is a protocol error (WS close
    * 1002 in the reference). A datetime that no format in the ladder can
    * parse is the same protocol error (app.py:230-244 rejects anything
    * dateutil can't parse) — validated HERE, at the protocol boundary, so a
    * bad seek string errors loudly instead of becoming a silent
    * deliver-nothing filter.
    */
  def offsetSpec(fromOrdinal: Option[Long] = None,
                 fromTimestamp: Option[Long] = None,
                 fromDatetime: Option[String] = None): Either[String, OffsetSpec] = {
    val given = List(fromOrdinal, fromTimestamp, fromDatetime).count(_.isDefined)
    if (given > 1) Left("1002: more than one stream_from_ parameter")
    else fromDatetime match {
      case Some(s) => parseDatetime(s).map(_ => FromDatetime(s))
      case None => Right(
        fromOrdinal.map(FromOrdinal).orElse(
          fromTimestamp.map(FromTimestamp)).getOrElse(Next))
    }
  }

  /** S5 — flexible datetime → epoch millis, the dateutil.parse analog
    * (reference/README.md:208-216): naive values are UTC; explicit offsets
    * are honored. The ladder covers ISO `T` and space-separated forms with
    * optional seconds/fraction, date-only, and RFC-1123. Unparseable ⇒
    * `Left("1002: …")`, the reference's protocol-error close code
    * (app.py:230-244). (dateutil's bare-time "13:33" form resolves against
    * TODAY's date — wall-clock-dependent, so deliberately unsupported in a
    * deterministic engine.)
    */
  def parseDatetime(s: String): Either[String, Long] = {
    import java.time._
    import java.time.format.DateTimeFormatter
    val t = s.trim
    def attempt(f: => Long): Option[Long] =
      try Some(f) catch { case _: Exception => None }
    val space = DateTimeFormatter.ofPattern("yyyy-M-d H:mm[:ss][.SSS]")
    val spaceTz = DateTimeFormatter.ofPattern("yyyy-M-d H:mm[:ss][.SSS]XXX")
    val parsed =
      attempt(OffsetDateTime.parse(t).toInstant.toEpochMilli)                          // 2024-01-20T06:30:00+02:00 | …Z
        .orElse(attempt(LocalDateTime.parse(t).toInstant(ZoneOffset.UTC).toEpochMilli)) // ISO 'T', naive ⇒ UTC
        .orElse(attempt(LocalDateTime.parse(t, space).toInstant(ZoneOffset.UTC).toEpochMilli)) // space-separated, naive
        .orElse(attempt(OffsetDateTime.parse(t, spaceTz).toInstant.toEpochMilli))       // space-separated with offset
        .orElse(attempt(LocalDate.parse(t).atStartOfDay.toInstant(ZoneOffset.UTC).toEpochMilli)) // date-only ⇒ midnight UTC
        .orElse(attempt(ZonedDateTime.parse(t, DateTimeFormatter.RFC_1123_DATE_TIME).toInstant.toEpochMilli))
    parsed.toRight(s"1002: unparseable stream_from_datetime: '$s'")
  }

  /** S2-S5 — apply a seek predicate to a batch log. `ordinal` and `tsMillis`
    * name the log's offset/broker-time columns. The predicate is a plain
    * range filter → parquet pushdown, no shuffle.
    *
    * S5 (datetime string): the reference parses flexible datetimes, treating
    * naive ones as UTC (reference/app/app.py:230-244); the session runs with
    * spark.sql.session.timeZone=UTC so `to_timestamp` matches.
    */
  def seek(df: DataFrame, spec: OffsetSpec, ordinal: Column, tsMillis: Column): DataFrame =
    df.filter(seekPredicate(spec, ordinal, tsMillis))

  /** The seek as a bare predicate — for callers that need to OR in an
    * exception (the streaming pipeline keeps a null-ordinal POISON pill
    * visible through the seek; a null offset fails any range predicate).
    */
  def seekPredicate(spec: OffsetSpec, ordinal: Column, tsMillis: Column): Column =
    spec match {
      case Next             => lit(false) // batch twin of "only new messages"
      case FromOrdinal(n)   => ordinal >= n
      case FromTimestamp(m) => tsMillis >= m
      case FromDatetime(s)  =>
        // offsetSpec validated the string already when the spec came through
        // the protocol boundary; a direct seek with a bad string fails loudly
        // with the same 1002 message rather than silently filtering all rows
        // (which is what feeding a null timestamp into the predicate did).
        val ms = parseDatetime(s).fold(e => throw new IllegalArgumentException(e), identity)
        tsMillis >= ms
    }

  /** S2-S5 as SOURCE options for the graft-log streaming source — the
    * canonical wiring for a NEXT consumer over a log with a backlog
    * (code-review r17): `EventStreamPipeline.seek` passes Next through as
    * a no-op filter, which is only correct over a HEAD-positioned
    * stream, while the source DEFAULTS to `startingOffsets=earliest` —
    * a Next consumer over a default-built source would replay the entire
    * retention archive instead of the reference's new-messages-only NEXT
    * (app.py:226-266). Ordinal/timestamp seeks also map to source
    * options here (the source's name-bounds segment skipping then prunes
    * at the file level, ahead of any in-plan filter — which remains
    * correct for them on any source position).
    */
  def logStream(spark: SparkSession, dir: String, spec: OffsetSpec): DataFrame = {
    val r = spark.readStream
      .format(classOf[graft.sources.GraftLogProvider].getName)
      .option("path", dir)
    (spec match {
      case Next             => r.option("startingOffsets", "latest")
      case FromOrdinal(n)   => r.option("startingOrdinal", n.toString)
      case FromTimestamp(m) => r.option("startingTimestamp", m.toString)
      case FromDatetime(s)  =>
        val ms = parseDatetime(s)
          .fold(e => throw new IllegalArgumentException(e), identity)
        r.option("startingTimestamp", ms.toString)
    }).load()
  }

  /** R6 — latest event per key (as-of "now"): the reference's "first event
    * after the given reference point" semantics (README.md:196-198) flipped
    * to per-key latest. One shuffle on the key; ties broken by ordinal so
    * the result is deterministic.
    */
  def latestPerKey(df: DataFrame, key: Column, ordinal: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ordinal.desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** R11 — row-level gap listing via a lag window: emits each gap with its
    * size. SMALL-DATA DIAGNOSTIC ONLY when called without partition keys —
    * Window.partitionBy() moves the whole stream to one task. The
    * registered queries use [[gapStats]], which needs no window at all;
    * keep this for per-key interactive inspection (pass the stream key).
    */
  def gaps(df: DataFrame, ordinal: Column, partitionKeys: Seq[Column] = Nil): DataFrame = {
    val w = (if (partitionKeys.isEmpty) Window.partitionBy()
             else Window.partitionBy(partitionKeys: _*)).orderBy(ordinal)
    df.withColumn("__gap", ordinal - lag(ordinal, 1).over(w) - 1)
      .filter(col("__gap") > 0)
  }

  /** R11 at scale — gap statistics with NO window: run starts are rows whose
    * predecessor ordinal is absent (left-anti self-join on ordinal+1, a
    * plain hash shuffle on (keys, ordinal) that parallelizes at any size),
    * so `n_gaps = runs − 1`; `lost = span − count` (README.md:229-233's
    * "first ordinal 150 ⇒ 49 lost" arithmetic, summed over every interior
    * gap as well). Identical results to the lag-window form on any stream
    * with unique ordinals per key — the algebra is exact, not approximate —
    * but survives a 100 TB stream where a global window cannot. Keyless call
    * = one stream's audit, ALWAYS a single output row — an empty stream
    * audits as (n_gaps=0, lost=0), matching what any ungrouped SQL
    * aggregate over the same sub-stream reports. Keyed call = one row per
    * stream; streams with zero observed messages have no group and so no
    * row (SQL GROUP BY agrees).
    */
  def gapStats(df: DataFrame, ordinal: String, keys: Seq[String] = Nil): DataFrame = {
    val e = df.select((keys :+ ordinal).map(col): _*)
    val cond = (keys.map(k => col(s"a.$k") === col(s"b.$k")) :+
      (col(s"a.$ordinal") === col(s"b.$ordinal") + 1)).reduce(_ && _)
    val runs = e.as("a").join(e.as("b"), cond, "left_anti")
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("__runs"))
    val spans = e.groupBy(keys.map(col): _*)
      .agg(min(col(ordinal)).as("__mn"), max(col(ordinal)).as("__mx"),
        count(lit(1)).as("__cnt"))
    // keyless groupBy() emits one (cnt=0, null-span) row even on EMPTY
    // input: keep it and coalesce to the (0,0) audit row — greatest()
    // absorbs runs−1 = −1 and coalesce() the null span, so the keyless
    // form never disagrees with an ungrouped SQL aggregate on row count.
    // Keyed groups only exist where rows do, so no guard is needed there.
    val joined = if (keys.isEmpty) spans.crossJoin(runs)
                 else spans.join(runs, keys)
    joined.select(keys.map(col) ++ Seq(
      greatest(col("__runs") - 1, lit(0L)).cast("long").as("n_gaps"),
      coalesce(col("__mx") - col("__mn") + 1 - col("__cnt"), lit(0L))
        .cast("long").as("lost")): _*)
  }
}
