package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Partial-aggregatable k-minimum DISTINCT values of a BIGINT column —
  * the KMV distinct-count sketch's state (Bar-Yossef et al., RANDOM 2002)
  * and the mergeable core of bottom-k sampling.
  *
  * Why a typed aggregate: the window formulation (`row_number() OVER
  * (PARTITION BY g ORDER BY h)` then `rn ≤ k`) shuffles and sorts EVERY
  * distinct hash to its group's partition; this buffer keeps a k-bounded
  * sorted set per group per partition, so at most k longs per group per
  * partition cross the network, and the merge (set-union, re-cap at k) IS
  * the KMV sketch union — the mergeable-summaries property [[TopKByScore]]
  * documents for top-k, here with DISTINCTNESS enforced by the set
  * (duplicate hashes must occupy one slot or the k-th minimum is wrong).
  *
  * Output: array<long> of the ≤k smallest distinct values, ascending —
  * deterministic, so engines agree element for element.
  */
case class MinKDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k > 0, "k must be positive")

  override def prettyName: String = "min_k_distinct"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def offer(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    buf.add(v)
    if (buf.size > k) buf.pollLast() // evict the largest kept
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) offer(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out) // TreeSet iterates ascending
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { offer(buf, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MinKDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinKDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}

object MinKDistinct {
  /** Column API: ascending array of the ≤k smallest distinct longs. */
  def minKDistinct(v: Column, k: Int): Column =
    ColumnBridge.column(
      MinKDistinct(ColumnBridge.expression(v), k).toAggregateExpression())
}
