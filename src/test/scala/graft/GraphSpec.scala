package graft

import graft.operators.GraphQueries
import org.apache.spark.sql.functions._

/** Graph-analytics family: PageRank, triangle census, components — planted
  * fixtures with hand-computable answers, plus a Scala reference fold for
  * the integer PageRank recurrence.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edgesDf(pairs: (Long, Long)*) =
    pairs.toSeq.toDF("a", "b").withColumn("w", lit(1L))

  /** Reference integer PageRank: the exact recurrence the query runs. */
  private def refPagerank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = e.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    var r = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = e.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = contrib.map { case (n, s) => n -> (150000L + (17L * s) / 20L) }
    }
    r
  }

  test("coPurchaseEdges: per-order pair explode matches hand counts, cap is total-ordered") {
    // order 1 carries parts {10, 20, 30} (30 via a duplicate lineitem —
    // distinct within the order), order 2 carries {20, 30}:
    // pairs (10,20)=1, (10,30)=1, (20,30)=2
    val li = Seq((1L, 10L), (1L, 20L), (1L, 30L), (1L, 30L), (2L, 20L), (2L, 30L))
      .toDF("l_orderkey", "l_partkey")
    val all = GraphQueries.coPurchaseEdges(li, cap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(all === Set((10L, 20L, 1L), (10L, 30L, 1L), (20L, 30L, 2L)))
    // cap=2 keeps (20,30) by weight, then (10,20) by the (w DESC, a, b)
    // total order — deterministic across partitionings
    val capped = GraphQueries.coPurchaseEdges(li, cap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(capped === Set((20L, 30L, 2L), (10L, 20L, 1L)))
  }

  test("g_pagerank core matches the integer recurrence on a planted graph — both paths") {
    // star (1 hub, 3 spokes) + disjoint pair: hub must out-rank spokes
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L))
    val want = refPagerank(edges, 5)
    // single-task endgame (default threshold) and the distributed loop
    // (threshold 0 forces it) must both replay the recurrence exactly —
    // integer-unit sums are order-independent, so bit-equal
    val got = GraphQueries.pagerank(edgesDf(edges: _*), iters = 5, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    val gotDist = GraphQueries.pagerank(edgesDf(edges: _*), iters = 5, topK = 10,
        localFinishEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDist === want)
    assert(got(1L) > got(2L), "hub must out-rank a spoke")
    assert(got(2L) === got(3L) && got(3L) === got(4L), "spokes symmetric")
  }

  test("g_triangles counts the planted K4-minus-an-edge exactly") {
    // K4 on {1,2,3,4} minus edge (3,4): triangles = {1,2,3}, {1,2,4} = 2
    // degrees: 1→3, 2→3, 3→2, 4→2 ⇒ wedges = 3+3+1+1 = 8
    val df = GraphQueries.triangles(
      edgesDf((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L)))
    val r = df.head()
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Long]("n_edges") === 5L)
    assert(r.getAs[Long]("n_triangles") === 2L)
    assert(r.getAs[Long]("n_wedges") === 8L)
    assert(math.abs(r.getAs[Double]("global_clustering") - 0.75) < 1e-9)
  }

  test("g_components: two planted clusters + a bridge collapse correctly") {
    // chain 1-2-3, pair 10-11, then bridging 3-10 merges them
    val apart = GraphQueries.components(edgesDf((1L, 2L), (2L, 3L), (10L, 11L)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(apart.toSet === Set((1L, 3L), (10L, 2L)))
    val merged = GraphQueries.components(
      edgesDf((1L, 2L), (2L, 3L), (10L, 11L), (3L, 10L)))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(merged.toSet === Set((1L, 5L)))
  }

  test("coPurchaseEdges: cap keeps the heaviest pairs under a total order") {
    val li = Seq(
      // parts 1,2 co-occur in 3 orders; 1,3 in 1; 2,3 in 1
      (100L, 1L), (100L, 2L),
      (101L, 1L), (101L, 2L),
      (102L, 1L), (102L, 2L),
      (103L, 1L), (103L, 3L),
      (104L, 2L), (104L, 3L)
    ).toDF("l_orderkey", "l_partkey")
    val all = GraphQueries.coPurchaseEdges(li, cap = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(all === Set((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 1L)))
    val capped = GraphQueries.coPurchaseEdges(li, cap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq === Seq((1L, 2L)), "cap must keep the heaviest edge")
  }

  test("g_pagerank_weighted: reference fold + dual-path + weight sensitivity") {
    // star: hub 1 connected to 2,3,4; edge (1,2) carries weight 8 vs 1 —
    // node 2 must outrank 3 and 4 under the weighted walk (it would tie
    // under the unweighted one)
    val edges = Seq((1L, 2L, 8L), (1L, 3L, 1L), (1L, 4L, 1L))
      .toDF("a", "b", "w")
    def ref(es: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] = {
      val und = es.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
      val wdeg = und.groupBy(_._1).map { case (n, xs) => n -> xs.map(_._3).sum }
      var r = wdeg.keys.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val c = r.map { case (n, rv) => n -> rv / wdeg(n) }
        val s = und.groupBy(_._2).map { case (dst, in) =>
          dst -> in.map { case (src, _, w) => c(src) * w }.sum }
        r = s.map { case (n, acc) => n -> (150000L + (17L * acc) / 20L) }
      }
      r
    }
    val expect = ref(Seq((1L, 2L, 8L), (1L, 3L, 1L), (1L, 4L, 1L)), 5)
    val local = GraphQueries.pagerankWeighted(edges, topK = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = GraphQueries.pagerankWeighted(edges, topK = 10, localFinishEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local === expect)
    assert(dist === expect)
    assert(local(2L) > local(3L) && local(3L) === local(4L))
  }

  test("g_kcore: planted triangle + pendant chain peels to the triangle") {
    // 1-2-3 triangle, 3-4-5 pendant chain: the chain peels in two rounds
    // (5 first, then 4), the triangle survives with within-core degree 2.
    val out = GraphQueries.kcore(
        edgesDf((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSet === Set((1L, 2L, true), (2L, 2L, true), (3L, 2L, true)))
  }

  test("g_kcore: closure holds on real data — every member has >=2 in-core neighbors") {
    val sf = "/root/testdata/sf0.001"
    val edges = GraphQueries.coPurchaseEdgesByKey(Tables.lineitem(spark, sf))
    val core = GraphQueries.kcore(edges).collect()
    assert(core.nonEmpty && core.forall(_.getBoolean(2)), "must reach the fixpoint")
    val members = core.map(_.getLong(0)).toSet
    val adj = edges.collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    core.foreach { r =>
      val inCore = adj(r.getLong(0)).count(members.contains)
      assert(inCore >= 2, s"node ${r.getLong(0)} has only $inCore in-core neighbors")
      assert(inCore.toLong === r.getLong(1), "core_deg must count in-core neighbors")
    }
  }

  test("g_kcore: single-task endgame and distributed loop are bit-equal") {
    val sf = "/root/testdata/sf0.001"
    val edges = GraphQueries.coPurchaseEdgesByKey(Tables.lineitem(spark, sf))
    val local = GraphQueries.kcore(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val dist = GraphQueries.kcore(edges, localFinishEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(local === dist)
  }

  test("g_kcore: unconverged peel reports converged=false, never silently") {
    // a long path peels one node per end per round; with rounds=1 the
    // 8-node path is still mid-peel => converged must be false
    val path = (1L to 7L).map(i => (i, i + 1))
    val out = GraphQueries.kcore(edgesDf(path: _*), k = 2, rounds = 1).collect()
    assert(out.nonEmpty && out.forall(!_.getBoolean(2)))
  }
}
