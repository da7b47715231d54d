package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the unsalted join result on skewed data") {
    // one hot key (90% of rows) + a tail
    val big = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toLong))).toDF("key", "payload")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"), ("missing", "X"))
      .toDF("key", "attr")

    val salted = SkewJoin.saltedEquiJoin(big, small, "key", salts = 8)
      .groupBy($"key", $"attr").agg(count(lit(1)).as("n"), sum($"payload").as("s"))
    val plain = big.join(small, Seq("key"))
      .groupBy($"key", $"attr").agg(count(lit(1)).as("n"), sum($"payload").as("s"))

    val a = salted.orderBy("key", "attr").collect().map(_.toString).toSeq
    val b = plain.orderBy("key", "attr").collect().map(_.toString).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("hot-key-only salting equals the plain join and actually splits the key space") {
    val big = ((1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"k${i % 10}", i.toLong))).toDF("key", "payload")
    val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"), ("missing", "X"))
      .toDF("key", "attr")

    val hot = SkewJoin.saltedEquiJoinHotKeys(big, small, "key", salts = 8,
        hotThreshold = 500L)
      .groupBy($"key", $"attr").agg(count(lit(1)).as("n"), sum($"payload").as("s"))
    val plain = big.join(small, Seq("key"))
      .groupBy($"key", $"attr").agg(count(lit(1)).as("n"), sum($"payload").as("s"))
    val a = hot.orderBy("key", "attr").collect().map(_.toString).toSeq
    val b = plain.orderBy("key", "attr").collect().map(_.toString).toSeq
    assert(a === b)
    // threshold picks exactly the one hot key, so both the salted and the
    // plain path carry rows (the union is exercised, not one degenerate arm)
    val hotKeys = big.groupBy($"key").count().filter($"count" > 500).collect()
    assert(hotKeys.map(_.getString(0)).toSeq === Seq("hot"))
    assert(a.exists(_.contains("hot")) && a.exists(_.contains("k1")))
  }

  test("hot-key salting with no hot keys degrades to the plain join") {
    val big = (1 to 100).map(i => (s"k${i % 10}", i.toLong)).toDF("key", "payload")
    val small = Seq(("k1", "A"), ("k2", "B")).toDF("key", "attr")
    val r = SkewJoin.saltedEquiJoinHotKeys(big, small, "key", salts = 4,
      hotThreshold = 1000L).orderBy("key", "payload").collect().map(_.toString).toSeq
    val p = big.join(small, Seq("key")).orderBy("key", "payload")
      .collect().map(_.toString).toSeq
    assert(r === p && r.nonEmpty)
  }

  test("salt spreads the hot key across sub-keys") {
    val big = (1 to 1000).map(i => ("hot", i.toLong)).toDF("key", "payload")
    val salts = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(8)).cast("int"))
      .groupBy("__salt").count().collect()
    assert(salts.length === 8) // all 8 sub-keys used
    assert(salts.map(_.getLong(1)).max < 1000 * 0.3) // no sub-key dominates
  }
}
