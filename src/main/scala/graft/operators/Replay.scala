package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * 1002 in the reference).
    */
  def offsetSpec(fromOrdinal: Option[Long] = None,
                 fromTimestamp: Option[Long] = None,
                 fromDatetime: Option[String] = None): Either[String, OffsetSpec] = {
    val given = List(fromOrdinal, fromTimestamp, fromDatetime).count(_.isDefined)
    if (given > 1) Left("1002: more than one stream_from_ parameter")
    else Right(
      fromOrdinal.map(FromOrdinal).orElse(
        fromTimestamp.map(FromTimestamp)).orElse(
        fromDatetime.map(FromDatetime)).getOrElse(Next))
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
    spec match {
      case Next             => df.filter(lit(false)) // batch twin of "only new messages"
      case FromOrdinal(n)   => df.filter(ordinal >= n)
      case FromTimestamp(m) => df.filter(tsMillis >= m)
      case FromDatetime(s)  =>
        df.filter(tsMillis >= unix_millis(to_timestamp(lit(s))))
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

  /** R11 — gap detection: lost-message count from non-contiguous ordinals
    * (README.md:229-233: "first message … ordinal 150 ⇒ 49 messages lost").
    * The lag window runs per partition key when one is given; a global
    * ordinal order (partitionBy()) is correct but single-partition — callers
    * at scale should pass the stream/routing key.
    */
  def gaps(df: DataFrame, ordinal: Column, partitionKeys: Seq[Column] = Nil): DataFrame = {
    val w = (if (partitionKeys.isEmpty) Window.partitionBy()
             else Window.partitionBy(partitionKeys: _*)).orderBy(ordinal)
    df.withColumn("__gap", ordinal - lag(ordinal, 1).over(w) - 1)
      .filter(col("__gap") > 0)
  }
}
