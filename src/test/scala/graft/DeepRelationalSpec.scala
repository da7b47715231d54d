package graft

import graft.operators.DeepRelational
import org.apache.spark.sql.functions._

/** Semantics checks for the round-2 relational operators: dedup clustering
  * against a driver-side union-find oracle, bucketed range join against the
  * naive non-equi join, sample determinism, and the subquery decorrelation
  * plan shape.
  */
class DeepRelationalSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("R17: d_dedup_cluster matches a union-find over the jaccard edges") {
    val edges = SparkEntry.queries("d_jaccard_pairs")(spark, d)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = Tables.documents(spark, d).select("doc_id")
      .collect().map(_.getLong(0))
    // driver-side union-find (path compression), the independent oracle
    val parent = scala.collection.mutable.Map(docs.map(x => x -> x): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = docs.map(x => x -> find(x)).toMap
    val got = SparkEntry.queries("d_dedup_cluster")(spark, d)
      .select("doc_id", "cluster_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === expected)
    // at least one real multi-doc cluster exists in the testdata
    assert(expected.values.groupBy(identity).exists(_._2.size > 1))
  }

  test("R13: bucketed range join equals the naive non-equi join") {
    val naive = {
      val e = Tables.events(spark, d)
        .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ms"))
      e.as("a").join(e.as("b"),
          col("a.user_id") === col("b.user_id") &&
          col("a.event_id") < col("b.event_id") &&
          abs(col("b.ms") - col("a.ms")) <= 60000L)
        .select(col("a.event_id"), col("b.event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val bucketed = SparkEntry.queries("q_range_join_bucketed")(spark, d)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed === naive)
    assert(naive.nonEmpty)
  }

  test("R10: stratified sample is deterministic and 10 per stratum") {
    val q = SparkEntry.queries("q_stratified_sample")
    val r1 = q(spark, d).collect().map(_.toString).toSeq
    val r2 = q(spark, d).collect().map(_.toString).toSeq
    assert(r1 === r2)
    val perSeg = q(spark, d).groupBy("c_mktsegment").count()
      .collect().map(_.getLong(1)).toSet
    assert(perSeg === Set(10L))
  }

  test("R18: edit distance covers every adjacent pair; known bounds hold") {
    val n = Tables.part(spark, d).count()
    val df = SparkEntry.queries("q_edit_distance")(spark, d)
    assert(df.count() === n - 1)
    val r = df.select(min("edit_dist"), max("name_sim")).head()
    assert(r.getInt(0) >= 0)
    assert(r.getDouble(1) <= 1.0)
  }

  test("R5: EXISTS subquery decorrelates to a semi join (no per-row re-execution)") {
    val plan = SparkEntry.queries("q_exists_subquery")(spark, d)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"))
  }

  test("R9: merged HLL sketches estimate distinct users within 5% of exact") {
    val rows = SparkEntry.queries("q_hll_union")(spark, d).collect()
    assert(rows.nonEmpty)
    val exact = Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (et, approx) = (r.getString(0), r.getLong(1))
      val e = exact(et).toDouble
      assert(math.abs(approx - e) / e <= 0.05, s"$et: approx=$approx exact=$e")
    }
  }

  test("R4: q14 promo share is a valid percentage and months are complete") {
    val rows = SparkEntry.queries("q14_promo")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pct = r.getDouble(1)
      assert(pct >= 0.0 && pct <= 100.0)
    }
  }
}
