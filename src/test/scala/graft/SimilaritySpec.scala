package graft

import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("R19: dot and cosine match hand-computed values") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(0.5, 0.1, 0.9))).toDF("a", "b")
    val r = df.select(
      dot($"a", $"b").as("d"),
      cosine($"a", $"b").as("c")).head()
    assert(math.abs(r.getDouble(0) - 3.4) < 1e-12)
    val expected = 3.4 / (math.sqrt(14.0) * math.sqrt(0.25 + 0.01 + 0.81))
    assert(math.abs(r.getDouble(1) - expected) < 1e-12)
  }

  test("R19: cosine of zero vector is null, identical vectors is 1") {
    val df = Seq(
      (Seq(0.0, 0.0), Seq(1.0, 1.0)),
      (Seq(2.0, 1.0), Seq(2.0, 1.0))).toDF("a", "b")
    val rows = df.select(cosine($"a", $"b").as("c")).collect()
    assert(rows(0).isNullAt(0))
    assert(math.abs(rows(1).getDouble(0) - 1.0) < 1e-12)
  }

  test("R19: identical vectors land in the same LSH bucket; planted near pair found") {
    val planes = hyperplanes(8, 4)
    val v = Seq(0.3, -0.2, 0.9, 0.1)
    val nearV = Seq(0.31, -0.19, 0.91, 0.1) // tiny perturbation
    val farV = Seq(-0.5, 0.8, -0.3, -0.9)
    val df = Seq((0L, v), (1L, nearV), (2L, farV)).toDF("vec_id", "v")
      .withColumn("bucket", lshBucket($"v", planes))
    val buckets = df.orderBy("vec_id").select("bucket").as[Long].collect()
    assert(buckets(0) === buckets(1)) // near-identical agree on all planes
    assert(buckets(0) !== buckets(2)) // opposite vector flips every plane
  }

  test("R19: hyperplanes are deterministic across calls") {
    val a = hyperplanes(4, 8)
    val b = hyperplanes(4, 8)
    assert(a.flatten === b.flatten)
  }
}
