package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * `queries` is the full operator inventory (SURVEY.md §2), one named entry
  * per operator; `oracleSql` carries the DuckDB-equivalent ANSI SQL for every
  * SQL-expressible one (same column names, deterministic ORDER BY).
  */
object SparkEntry {

  /** Flagship query (sf0.001; driver smoke-checks rows>0): the reference's
    * entire per-message data plane in one pipeline — decode-guard, POISON
    * filter, format dispatch, enrichment — over the events log
    * (reference/app/app.py:393-526).
    */
  def entry(spark: SparkSession): DataFrame = {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val tsMs = unix_millis(col("ts"))
    e.filter(Envelope.forwardable(col("props")))
      .select(
        col("event_id").as("ess_ordinal"),
        tsMs.as("ess_timestamp"),
        col("event_type").as("message_type"),
        when(Envelope.isJson(col("props")),
             Envelope.enrichJson(col("props"), col("event_id"), tsMs))
          .otherwise(Envelope.enrichProtoText(col("props"), col("event_id"), tsMs))
          .as("wire"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EventQueries.defs ++ RelationalQueries.defs ++ DedupQueries.defs ++
      SimilarityQueries.defs ++ TextQueries.defs ++ MultimodalQueries.defs ++
      ExtendedQueries.defs ++ DeepRelational.defs ++ Round3Queries.defs ++
      Round4Queries.defs ++ Round7Queries.defs ++ Round9Queries.defs ++
      Round11Queries.defs ++ Round12Queries.defs ++ Round13Queries.defs ++
      Round14Queries.defs ++ Round15Queries.defs ++ Round17Queries.defs ++
      AnalyticsQueries.defs ++ GraphQueries.defs ++ WarehouseQueries.defs

  /** DuckDB-runnable ANSI SQL twin for each SQL-expressible query. */
  def oracleSql: Map[String, String] =
    EventQueries.oracles ++ RelationalQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ TextQueries.oracles ++ MultimodalQueries.oracles ++
      ExtendedQueries.oracles ++ DeepRelational.oracles ++ Round3Queries.oracles ++
      Round4Queries.oracles ++ Round7Queries.oracles ++ Round9Queries.oracles ++
      Round11Queries.oracles ++ Round12Queries.oracles ++ Round13Queries.oracles ++
      Round14Queries.oracles ++ Round15Queries.oracles ++ Round17Queries.oracles ++
      AnalyticsQueries.oracles ++ GraphQueries.oracles ++ WarehouseQueries.oracles
}
