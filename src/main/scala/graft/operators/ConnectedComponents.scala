package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation with pointer
  * jumping — the general engine behind `d_dedup_cluster` (SURVEY.md §2.3
  * R17/R18), usable on any undirected edge set.
  *
  * Algorithm per round: (1) every node takes the min label among itself and
  * its neighbors; (2) pointer jump — every node then takes its label's own
  * label, halving remaining chain depth, so rounds are O(log longest path).
  * Labels only decrease, so the label SUM is strictly decreasing until the
  * fixpoint — the convergence test is one cheap aggregate per round.
  *
  * Scale properties: per round two edge⋈label joins + one min-aggregate +
  * one representative join, all keyed shuffles sized by |labels| and
  * |edges|, never any n² structure; lineage is truncated each round
  * (localCheckpoint) so the plan stays constant-size. Intended use is on
  * the (sparse) edge SUBGRAPH — callers union isolated nodes back as
  * singletons, as d_dedup_cluster does.
  */
object ConnectedComponents {

  /** Components of the graph spanned by `edges` (columns `src`, `dst`; both
    * Long). Returns one row per node that appears in an edge:
    * (doc_id, label) where label = min node id of the component.
    */
  def ofEdges(edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    // Undirected form up front: both directions materialized ONCE, so the
    // per-round message step is a single join instead of two (same shuffled
    // row count, half the stages — rounds are overhead-bound on sparse
    // subgraphs).
    val e = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    // init = first neighbor-min fused into the node-set build: same
    // aggregate the plain distinct would cost, one propagation round free
    var labels = e
      .groupBy(col("src").as("doc_id"))
      .agg(min(least(col("src"), col("dst"))).as("label"))
      .localCheckpoint(true)
    var prevSum = Long.MinValue
    var curSum = labels.agg(coalesce(sum(col("label")), lit(0L))).head().getLong(0)
    var round = 0
    while (curSum != prevSum && round < maxRounds) {
      val l1 = labels.select(col("doc_id").as("j"), col("label"))
      val msgs = e.join(l1, col("src") === col("j"))
        .select(col("dst").as("doc_id"), col("label"))
      val stepped = labels.unionByName(msgs)
        .groupBy(col("doc_id")).agg(min(col("label")).as("label"))
      // double pointer jump: each halves remaining chain depth, so two per
      // round quarter it — fewer (expensive) rounds for two cheap joins
      def jump(df: DataFrame): DataFrame = {
        val r = df.select(col("doc_id").as("rep_id"), col("label").as("rep_label"))
        df.join(r, col("label") === col("rep_id"))
          .select(col("doc_id"), col("rep_label").as("label"))
      }
      val next = jump(jump(stepped)).localCheckpoint(false)
      prevSum = curSum
      curSum = next.agg(coalesce(sum(col("label")), lit(0L))).head().getLong(0)
      labels = next
      round += 1
    }
    // Exiting on the round cap without the sum fixpoint means the labels
    // are only partially propagated — silently returning them would hand
    // callers (e.g. d_dedup_cluster) wrong component ids with no signal.
    // Convergence is already measured at this point, so fail loudly.
    if (curSum != prevSum)
      throw new IllegalStateException(
        s"ConnectedComponents did not converge within $maxRounds rounds " +
          s"(label sum still moving: $prevSum -> $curSum); raise maxRounds")
    labels
  }
}
