package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.IntegerType

/** Top-k rows per key as a first-class operator (SURVEY.md §2.3 R10; the
  * guide's preference-ladder rung (c): LogicalPlan + Strategy + SparkPlan).
  *
  * Motivation — the window formulation
  * `row_number().over(Window.partitionBy(keys).orderBy(ord)) <= k`
  * shuffles EVERY input row on the keys and then fully sorts each key
  * partition: O(n) shuffle volume and O(n log n) sort for an output of only
  * k rows per key. This operator runs in two heap phases:
  *
  *   1. [[TopKPerKeyPartialExec]] (map side, no distribution requirement):
  *      one bounded heap per key per input partition → at most k rows per
  *      (key, partition) enter the shuffle;
  *   2. [[TopKPerKeyFinalExec]] (requires clustering on the keys — Catalyst
  *      inserts the exchange): merges the partial survivors, emits each
  *      key's top k in order with a rank column appended.
  *
  * At 100 TB with k=3 this cuts shuffle volume by ~n/(3·parts) and removes
  * the per-key sort entirely (O(n log k) heap work, embarrassingly
  * parallel). Results are identical to the window form — the oracle of
  * q_topk_per_segment verifies the native variant byte-for-byte.
  */
case class TopKPerKey(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  // rankAttr is produced HERE, not consumed from the child — without this,
  // CheckAnalysis counts it as a missing input attribute.
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey = copy(child = c)
}

/** Shared heap logic: per-key bounded "keep the k best under `ord`". */
private[plans] object TopKHeaps {
  type Heaps = java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]

  def accumulate(
      iter: Iterator[InternalRow],
      keyProj: UnsafeProjection,
      rowProj: UnsafeProjection,
      ord: Ordering[InternalRow],
      k: Int): Heaps = {
    // PriorityQueue with reversed ordering: head = worst survivor, evicted
    // when a better row arrives and the heap is full.
    val heaps = new Heaps
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        // INITIAL capacity only — the queue grows as needed. Allocating
        // k+1 eagerly overflowed to a negative capacity at k=Int.MaxValue
        // and pre-allocated huge arrays for large k before a single row
        // arrived (code-review r17); the rewrite rule separately caps the
        // k it will capture (TopKRewriteRule.MaxRewriteK).
        heap = new java.util.PriorityQueue[UnsafeRow](
          math.min(k, 64) + 1, ord.reverse.asInstanceOf[Ordering[UnsafeRow]])
        heaps.put(key.copy(), heap)
      }
      // compare on the RAW row (ord is bound to childOutput ordinals, and
      // the heap's UnsafeRows share that layout) — projecting just to
      // compare would run the full-row projection up to twice per input
      if (heap.size() < k) heap.add(rowProj(row).copy())
      else if (ord.lt(row, heap.peek())) { heap.poll(); heap.add(rowProj(row).copy()) }
    }
    heaps
  }
}

case class TopKPerKeyPartialExec(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val g = groupExprs
    val o = orderExprs
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ord = org.apache.spark.sql.catalyst.expressions.RowOrdering.create(o, childOutput)
      val heaps = TopKHeaps.accumulate(iter, keyProj, rowProj, ord, kk)
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyPartialExec = copy(child = c)
}

case class TopKPerKeyFinalExec(
    groupExprs: Seq[Expression],
    orderExprs: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    // empty grouping = global top-k: all partial survivors must meet in one
    // partition (like a global aggregate), or every partition would emit
    // its own rank-1..k rows
    if (groupExprs.isEmpty) Seq(AllTuples)
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val outAttrs = output
    val g = groupExprs
    val o = orderExprs
    val kk = k
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(g, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ord = org.apache.spark.sql.catalyst.expressions.RowOrdering.create(o, childOutput)
      val heaps = TopKHeaps.accumulate(iter, keyProj, rowProj, ord, kk)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { heap =>
        val rows = heap.iterator().asScala.toArray.sorted(ord.asInstanceOf[Ordering[UnsafeRow]])
        rows.iterator.zipWithIndex.map { case (r, i) =>
          outProj(joined(r, InternalRow(i + 1)))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyFinalExec = copy(child = c)
}

/** Planner strategy: logical TopKPerKey → partial + final heap execs. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(g, o, k, rank, child) =>
      TopKPerKeyFinalExec(g, o, k, rank,
        TopKPerKeyPartialExec(g, o, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** User-facing API: `TopK.perKey(df, keys, order, k)` — builds the logical
  * node from resolved columns of `df` and registers the strategy on the
  * session (idempotent, via experimental.extraStrategies).
  */
object TopK {
  /** Sort key for [[perKey]]: column name + direction. */
  final case class Ord(name: String, desc: Boolean = false)

  /** Idempotent strategy registration — ONE definition shared with
    * [[TopKRewrite.enable]] (code-review r17: the snippet lived twice).
    */
  private[plans] def registerStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy

  def perKey(df: DataFrame, keys: Seq[String], order: Seq[Ord], k: Int,
             rankCol: String = "rk"): DataFrame = {
    require(k >= 1, s"top-k needs k >= 1, got $k")
    require(order.nonEmpty, "top-k needs at least one sort key")
    val spark = df.sparkSession
    registerStrategy(spark)
    val child = df.queryExecution.analyzed
    // resolve names against the analyzed child so the node is born resolved
    // (Connect-style Column wrappers don't resolve inside custom operators)
    val resolver = spark.sessionState.analyzer.resolver // honors spark.sql.caseSensitive
    def attr(n: String): Attribute = child.output.find(a => resolver(a.name, n)).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${child.output.map(_.name).mkString(", ")}"))
    val g = keys.map(attr)
    val o = order.map(s => SortOrder(attr(s.name), if (s.desc) Descending else Ascending))
    val rank = AttributeReference(rankCol, IntegerType, nullable = false)()
    ColumnBridge.ofRows(spark, TopKPerKey(g, o, k, rank, child))
  }
}
