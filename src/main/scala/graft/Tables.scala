package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md / FIXTURES.md §B).
  *
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) and read one
  * parquet file per table. Reads are plain `spark.read.parquet` so Catalyst
  * handles column pruning + predicate pushdown into the scan — at 100 TB the
  * same loaders point at a partitioned table root and partition pruning /
  * pushed filters do the heavy lifting; nothing here assumes single-file
  * inputs.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // every registered query starts from a Tables load, so registering
    // the native functions here (idempotent createOrReplaceTempFunction)
    // removes a whole bug class: a query whose expressions use graft_*
    // but whose author forgot the explicit register call worked only
    // when ANOTHER query had registered first in the same session —
    // correct in shared-session runs, broken when it ran first (caught
    // live: d_containment threw UNRESOLVED_ROUTINE in Bench's ordering
    // while passing Verify's).
    graft.plans.GraftFunctions.register(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped in two encodings across driver testdata
    * generations: INT64 TIMESTAMP(NANOS) — which Spark's vectorized reader
    * rejects unless read as raw nanos via the legacy flag — and plain
    * TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads as
    * TIMESTAMP_NTZ. Normalize both to the session-UTC TimestampType every
    * downstream query expects: nanos convert with integer division (a
    * double division would lose precision above 2^53 ns), NTZ casts
    * value-preserving because the session timezone is pinned to UTC.
    * DuckDB reads either file as a naive TIMESTAMP; both engines therefore
    * agree on epoch-millis values.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => raw
      case other =>
        // a third driver encoding must fail here, at the cause, not
        // propagate wrong-typed values into every downstream query
        throw new IllegalStateException(
          s"events.ts has unrecognized parquet encoding $other; " +
            "extend Tables.events with an explicit normalization for it")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
