package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint checking — the validation pass every
  * training-data pipeline runs before a corpus ships (SURVEY.md §2.3 R20
  * extension; the engine-side analog of the reference's per-message guards,
  * reference/app/app.py:433-485, generalized to declarative row contracts).
  *
  * Two evaluation modes over the same declarative checks:
  *   - [[violations]]: one aggregate row of per-check violation counts —
  *     a single hash-agg pass, oracle-verifiable.
  *   - [[observed]]: `Dataset.observe` metrics piggybacked on whatever
  *     action runs anyway — ZERO extra passes over 100 TB, works on
  *     streaming DataFrames (per micro-batch), surfaces through
  *     QueryExecutionListener / StreamingQueryProgress.
  */
object DataQuality {

  /** A named row-level contract: `predicate` must hold for every row. */
  final case class Check(name: String, predicate: Column)

  /** Violation counts per check plus the row total, in one pass. */
  def violations(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = count(lit(1)).as("n_rows") +: checks.map(c =>
      sum(when(!coalesce(c.predicate, lit(false)), 1L).otherwise(0L)).as(s"viol_${c.name}"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** The same counts as observe() metrics on `df` (metric name
    * `graft_quality`) — read them from the listener/progress after any
    * action; no extra job.
    */
  def observed(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = checks.map(c =>
      sum(when(!coalesce(c.predicate, lit(false)), 1L).otherwise(0L)).as(s"viol_${c.name}")) :+
      count(lit(1)).as("n_rows")
    df.observe("graft_quality", aggs.head, aggs.tail: _*)
  }
}
