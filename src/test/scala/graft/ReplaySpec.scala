package graft

import graft.operators.Replay
import graft.operators.Replay._
import org.apache.spark.sql.functions._

class ReplaySpec extends SparkSpec {
  import spark.implicits._

  private def log = Seq(
    (1L, 1000L, "a"), (2L, 2000L, "b"), (3L, 3000L, "c"),
    (5L, 5000L, "d"), (150L, 150000L, "e")
  ).toDF("ordinal", "ts_ms", "body")

  test("S6: at most one seek parameter") {
    assert(offsetSpec() === Right(Next))
    assert(offsetSpec(fromOrdinal = Some(3)) === Right(FromOrdinal(3)))
    assert(offsetSpec(fromOrdinal = Some(3), fromTimestamp = Some(9)).isLeft)
  }

  test("S3: ordinal seek is inclusive; 0 means whole stream (README.md:200-203)") {
    val all = Replay.seek(log, FromOrdinal(0), $"ordinal", $"ts_ms")
    assert(all.count() === 5)
    val from3 = Replay.seek(log, FromOrdinal(3), $"ordinal", $"ts_ms")
      .orderBy("ordinal").select("ordinal").as[Long].collect()
    assert(from3.toSeq === Seq(3L, 5L, 150L))
  }

  test("S4: timestamp seek delivers first message with broker ts >= given") {
    val got = Replay.seek(log, FromTimestamp(2500L), $"ordinal", $"ts_ms")
      .orderBy("ordinal").select("ordinal").as[Long].collect()
    assert(got.toSeq === Seq(3L, 5L, 150L))
  }

  test("S5: datetime seek, naive string treated as UTC") {
    val utcLog = Seq((1L, 1704067200000L), (2L, 1704070800000L)) // 00:00 and 01:00 UTC on 2024-01-01
      .toDF("ordinal", "ts_ms")
    val got = Replay.seek(utcLog, FromDatetime("2024-01-01 00:30:00"), $"ordinal", $"ts_ms")
      .select("ordinal").as[Long].collect()
    assert(got.toSeq === Seq(2L))
  }

  test("S2: NEXT yields nothing in batch (only new messages)") {
    assert(Replay.seek(log, Next, $"ordinal", $"ts_ms").count() === 0)
  }

  test("R11: gap arithmetic — ordinal 100 then 150 means 49 lost (README.md:229-233)") {
    val df = Seq(100L, 150L).toDF("ordinal")
    val gaps = Replay.gaps(df, $"ordinal").select($"__gap".as[Long]).collect()
    assert(gaps.toSeq === Seq(49L))
  }

  test("R11: gapStats join algebra equals the lag-window form, keyless and per key") {
    // stream A: runs {0..2},{10..11},{20} → 2 interior gaps, lost 7+8=15
    // stream B: contiguous {5,6,7} → 0 gaps; stream C: single row → 0 gaps
    val rows = Seq(0L, 1L, 2L, 10L, 11L, 20L).map(("A", _)) ++
      Seq(5L, 6L, 7L).map(("B", _)) ++ Seq(("C", 99L))
    val df = rows.toDF("k", "ordinal")
    val perKey = Replay.gapStats(df, "ordinal", Seq("k"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(perKey.toSeq === Seq(("A", 2L, 15L), ("B", 0L, 0L), ("C", 0L, 0L)))
    val global = Replay.gapStats(df.filter($"k" === "A"), "ordinal")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(global.toSeq === Seq((2L, 15L)))
    // keyless audit of an EMPTY sub-stream: exactly one (0, 0) row — the
    // same row count an ungrouped SQL aggregate (the DuckDB oracle shape)
    // reports, so r_gap_detect cannot rows-mismatch at a scale factor
    // where no event happens to match the sub-stream filter
    val empty = Replay.gapStats(df.filter($"k" === "Z"), "ordinal")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(empty.toSeq === Seq((0L, 0L)))
    // keyed form: no group ⇒ no row (SQL GROUP BY agrees)
    assert(Replay.gapStats(df.filter($"k" === "Z"), "ordinal", Seq("k"))
      .collect().isEmpty)
  }

  test("R6: latest per key, deterministic on ordinal ties") {
    val df = Seq(("u1", 1L, "old"), ("u1", 9L, "new"), ("u2", 4L, "only"))
      .toDF("k", "ordinal", "v")
    val got = Replay.latestPerKey(df, $"k", $"ordinal")
      .orderBy("k").select("v").as[String].collect()
    assert(got.toSeq === Seq("new", "only"))
  }
}
