package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time stateful operators for the streaming layer (SURVEY.md §2.4
  * T3-T4, §2.3 R13/R14/R17 streaming twins).
  *
  * The reference itself does no event-time processing (broker timestamp
  * only annotates — app/app.py:487-494); these are the driver-mandated
  * extensions, expressed with watermarks so state is bounded at scale:
  * a watermark caps how long per-window/per-key state lives, which is what
  * makes these operators safe on an unbounded 100 TB/day stream.
  */
object StreamingAggs {

  /** R13 streaming — tumbling event-time window counts with bounded state. */
  def windowedCounts(df: DataFrame, tsCol: String, window_ : String,
                     watermark: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("routing_key"))
      .agg(count(lit(1)).as("n"))

  /** R14 streaming — session windows per key (inactivity gap). */
  def sessions(df: DataFrame, tsCol: String, gap: String,
               watermark: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("routing_key"))
      .agg(count(lit(1)).as("n_events"))

  /** R17 streaming — dedup with bounded state: drops re-deliveries of the
    * same ordinal seen within the watermark horizon.
    */
  def dedupWithinWatermark(df: DataFrame, tsCol: String,
                           watermark: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("routing_key", "ordinal")
}
