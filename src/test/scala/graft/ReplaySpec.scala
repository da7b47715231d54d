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

  test("R6: latest per key, deterministic on ordinal ties") {
    val df = Seq(("u1", 1L, "old"), ("u1", 9L, "new"), ("u2", 4L, "only"))
      .toDF("k", "ordinal", "v")
    val got = Replay.latestPerKey(df, $"k", $"ordinal")
      .orderBy("k").select("v").as[String].collect()
    assert(got.toSeq === Seq("new", "only"))
  }
}
