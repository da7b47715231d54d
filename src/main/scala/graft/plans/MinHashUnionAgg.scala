package graft.plans

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import java.nio.ByteBuffer

/** Group-level MinHash signature union (SURVEY.md §2.5): element-wise MIN of
  * per-document MinHash signatures across a group.
  *
  * The union property of MinHash — min over a set union equals the
  * element-wise min of per-set minima — means this aggregate yields the
  * signature OF THE GROUP'S SHINGLE UNION without ever materializing it.
  * Group signatures then estimate cross-group Jaccard (fraction of equal
  * signature positions), e.g. corpus-overlap between sources/shards.
  *
  * TypedImperativeAggregate with a fixed k-long buffer: constant-size state,
  * partial aggregation on the map side, one shuffle row per group — the
  * sketch shape that scales to any corpus size.
  */
case class MinHashUnionAgg(
    child: Expression,
    k: Int = 32,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_union"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_minhash_union expects array<bigint> signatures, got ${t.catalogString}")
    }

  // buffer layout: k minima + a trailing seen-flag slot. Without the flag,
  // a group whose every signature is NULL (all too-short docs, or a
  // filtered-empty frame) evaluated to the all-MaxValue sentinel — the
  // exact every-empty-doc-looks-identical bug MinHashSig's null-on-empty
  // exists to prevent, resurfacing one aggregation later: two such groups
  // compare as estimated-Jaccard-1.0 overlap (code-review r17). A
  // never-updated buffer now evaluates to NULL.
  override def createAggregationBuffer(): Array[Long] = {
    val buf = new Array[Long](k + 1)
    java.util.Arrays.fill(buf, 0, k, Long.MaxValue)
    buf // buf(k) = 0: no signature folded in yet
  }

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      // width mismatch is a caller bug (a signature built with a different
      // k): truncating or leaving MaxValue sentinels would silently bias
      // the downstream equal-position Jaccard estimate — fail loudly
      require(arr.numElements() == k,
        s"graft_minhash_union: signature width ${arr.numElements()} != expected $k")
      val n = k
      var i = 0
      while (i < n) {
        val x = arr.getLong(i)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
      buf(k) = 1L
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    if (b(k) != 0L) a(k) = 1L
    a
  }

  override def eval(buf: Array[Long]): Any =
    if (buf(k) == 0L) null
    else new GenericArrayData(java.util.Arrays.copyOf(buf, k))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate((k + 1) * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    // wire format is k signature slots + 1 non-empty flag (ADVICE r17: a
    // buffer serialized by a k-mismatched caller or a pre-flag build must
    // fail with the expected width named, not BufferUnderflow/garbage)
    require(bytes.length == (k + 1) * 8,
      s"graft_minhash_union: buffer ${bytes.length} bytes, expected ${(k + 1) * 8} (k=$k + non-empty flag)")
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k + 1)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashUnionAgg =
    copy(child = c.head)
}
