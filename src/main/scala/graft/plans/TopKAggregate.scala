package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Partial-aggregatable per-group top-k.
  *
  * The window-function formulation (`row_number() OVER (PARTITION BY g
  * ORDER BY s)` then `rn <= k`) must shuffle EVERY row to its group's
  * partition before ranking. This aggregate keeps a k-bounded heap per
  * group on the map side, so only k rows per group per partition cross the
  * network — at 100 TB with low-cardinality groups that is the difference
  * between shuffling the table and shuffling kilobytes.
  *
  * Input: (score double, id long); output: array<struct<score,id>> ordered
  * by (score desc, id asc) — deterministic tie-break matching the
  * row_number formulation.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  override def prettyName: String = "topk_by_score"
  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))), containsNull = false)

  // total order: better = higher score, then lower id.
  // min-heap keeps the WORST of the kept k at the head for O(log k) evict.
  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (s, -i) }

  override def createAggregationBuffer(): java.util.PriorityQueue[(Double, Long)] =
    new java.util.PriorityQueue[(Double, Long)](k + 1, ord)

  private def offer(buf: java.util.PriorityQueue[(Double, Long)], s: Double, i: Long): Unit = {
    buf.offer((s, i))
    if (buf.size > k) buf.poll() // drop the worst
  }

  override def update(
      buf: java.util.PriorityQueue[(Double, Long)], input: InternalRow): java.util.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.PriorityQueue[(Double, Long)],
      other: java.util.PriorityQueue[(Double, Long)]): java.util.PriorityQueue[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) { val (s, i) = it.next(); offer(buf, s, i) }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[(Double, Long)]): Any = {
    val arr = buf.toArray(new Array[(Double, Long)](buf.size))
    val sorted = arr.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }: Array[Any])
  }

  override def serialize(buf: java.util.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (s, i) = it.next(); bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { offer(buf, bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(score = cs(0), id = cs(1))
}

object TopKByScore {
  /** Column API: array of the k best (score, id) per group. */
  def topkByScore(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
