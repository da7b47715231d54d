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
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_union"

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

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
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MinHashUnionAgg =
    copy(child = c.head)
}
