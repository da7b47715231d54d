package graft

import graft.operators.WarehouseQueries
import org.apache.spark.sql.functions._

/** Warehouse/monitoring family: MAD outliers, CUSUM changepoint, Z-order
  * clustering, SCD2 — planted fixtures with hand-computed answers.
  */
class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("r_anomaly_mad core: planted outlier flagged, med/MAD exact") {
    // values 1..9 plus 100: median 5.5, MAD 2.5, threshold 3·1.4826·2.5 ≈
    // 11.12 ⇒ only the 100 (dev 94.5) is an outlier
    val ev = ((1 to 9).map(_.toDouble) :+ 100.0)
      .map(v => ("t", v)).toDF("event_type", "value")
    val r = WarehouseQueries.madOutliers(ev).head()
    assert(r.getAs[Long]("n") === 10L)
    assert(r.getAs[Double]("med") === 5.5)
    assert(r.getAs[Double]("mad") === 2.5)
    assert(r.getAs[Long]("n_outliers") === 1L)
  }

  test("r_changepoint_cusum core: planted level shift found at the step") {
    // counts 10,10,10,20,20,20 over six days: mean 15, CUSUM (in 1e4
    // units) -5,-10,-15,-10,-5,0 ⇒ max |CUSUM| = 150000 on day 3
    val rows = for {
      (day, cnt) <- Seq("2024-01-01" -> 10, "2024-01-02" -> 10, "2024-01-03" -> 10,
        "2024-01-04" -> 20, "2024-01-05" -> 20, "2024-01-06" -> 20)
      _ <- 1 to cnt
    } yield ("a", day)
    val ev = rows.toDF("event_type", "d")
      .select(col("event_type"), to_timestamp(col("d")).as("ts"))
    val r = WarehouseQueries.changepoint(ev).head()
    assert(r.getAs[Long]("n_days") === 6L)
    assert(r.getAs[java.sql.Date]("cp_day").toString === "2024-01-03")
    assert(r.getAs[Long]("max_abs_cusum_units") === 150000L)
  }

  test("q_zorder_cluster core: extent corners land in buckets 0/5/10/15") {
    // after extent normalization the four corners are (0,0), (max,0),
    // (0,max), (max,max) ⇒ Morton top-4-bits 0, 5, 10, 15
    val orders = Seq(
      (1L, "1995-01-01"), (100L, "1995-01-01"),
      (1L, "1998-12-31"), (100L, "1998-12-31")
    ).toDF("o_custkey", "d")
      .select(col("o_custkey"), to_date(col("d")).as("o_orderdate"))
    val got = WarehouseQueries.zorderCluster(orders)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n")))
    assert(got.toSet === Set((0L, 1L), (5L, 1L), (10L, 1L), (15L, 1L)))
  }

  test("q_zorder_cluster core: interleave matches a bit-level reference") {
    def refSpread(v: Long): Long = {
      var s = v
      s = (s | (s << 8)) & 0x00FF00FFL
      s = (s | (s << 4)) & 0x0F0F0F0FL
      s = (s | (s << 2)) & 0x33333333L
      s = (s | (s << 1)) & 0x55555555L
      s
    }
    // drive the production core with a 2-row frame whose extents make the
    // normalization the identity on (0 .. 65535)
    val orders = Seq((0L, "1970-01-01"), (65535L, "2149-06-06"))
      .toDF("o_custkey", "d")
      .select(col("o_custkey"), to_date(col("d")).as("o_orderdate"))
    // 2149-06-06 is epoch day 65535, so x = ck and y = dy exactly
    val buckets = WarehouseQueries.zorderCluster(orders)
      .collect().map(_.getLong(0)).toSet
    val wantB = Set(0L, 65535L).map(v =>
      (refSpread(v) | (refSpread(v) << 1)) >> 28)
    assert(buckets === wantB)
  }

  test("q_scd2_orders core: planted status timeline collapses into runs") {
    val orders = Seq(
      (1L, 10L, "1995-01-01", "O"),
      (1L, 11L, "1995-02-01", "O"),
      (1L, 12L, "1995-03-01", "F"),
      (1L, 13L, "1995-04-01", "O")
    ).toDF("o_custkey", "o_orderkey", "d", "o_orderstatus")
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("d")).as("o_orderdate"), col("o_orderstatus"))
    val got = WarehouseQueries.scd2(orders).collect().map(r =>
      (r.getAs[Int]("seq"), r.getAs[String]("status"),
        r.getAs[java.sql.Date]("valid_from").toString,
        Option(r.getAs[java.sql.Date]("valid_to")).map(_.toString),
        r.getAs[Long]("n_orders"), r.getAs[Int]("is_current")))
    assert(got.toSeq === Seq(
      (1, "O", "1995-01-01", Some("1995-03-01"), 2L, 0),
      (2, "F", "1995-03-01", Some("1995-04-01"), 1L, 0),
      (3, "O", "1995-04-01", None, 1L, 1)))
  }

  test("q_scd2_orders core: same-day tie breaks on orderkey, runs stay deterministic") {
    val orders = Seq(
      (7L, 20L, "1996-01-01", "F"),
      (7L, 21L, "1996-01-01", "O") // same day: orderkey 20 (F) sorts first
    ).toDF("o_custkey", "o_orderkey", "d", "o_orderstatus")
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("d")).as("o_orderdate"), col("o_orderstatus"))
    val got = WarehouseQueries.scd2(orders).collect()
      .map(r => (r.getAs[Int]("seq"), r.getAs[String]("status")))
    assert(got.toSeq === Seq((1, "F"), (2, "O")))
  }

  test("r_cdc_merge core: MERGE fold — tombstone wipes, re-insert revives, orphan updates are no-ops") {
    val ev = Seq(
      // user 1: inserted, updated, then deleted; the post-delete click has
      // no insert after it ⇒ absent from the snapshot
      (1L, 1L, "signup", 0.0), (1L, 2L, "click", 0.0),
      (1L, 3L, "purchase", 10.5), (1L, 4L, "error", 0.0), (1L, 5L, "click", 0.0),
      // user 2: full lifecycle then revival — only events from the
      // re-insert (14) on contribute
      (2L, 10L, "signup", 0.0), (2L, 11L, "purchase", 2.0), (2L, 12L, "error", 0.0),
      (2L, 13L, "click", 0.0), (2L, 14L, "signup", 0.0), (2L, 15L, "view", 0.0),
      (2L, 16L, "purchase", 1.5),
      // user 3: updates with no insert ever ⇒ absent
      (3L, 20L, "click", 0.0), (3L, 21L, "view", 0.0),
      // user 4: bare insert ⇒ present, no updates
      (4L, 30L, "signup", 0.0),
      // user 5: delete before any insert, then insert+update ⇒ live
      (5L, 40L, "error", 0.0), (5L, 41L, "signup", 0.0), (5L, 42L, "click", 0.0)
    ).toDF("user_id", "event_id", "event_type", "value")
    val got = WarehouseQueries.cdcMergeApply(ev).collect().map(r =>
      (r.getAs[Long]("user_id"), r.getAs[Long]("live_since"),
        r.getAs[Long]("last_event_id"), r.getAs[Long]("n_updates"),
        r.getAs[Long]("purchase_units")))
    assert(got.toSeq === Seq(
      (2L, 14L, 16L, 2L, 15000L),
      (4L, 30L, 30L, 0L, 0L),
      (5L, 41L, 42L, 1L, 0L)))
  }
}
