package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Elementwise MAX over packed HLL register arrays — the merge aggregate
  * of sketch-per-key algorithms (HyperBall:
  * [[graft.graph.Graph.harmonicCentralityHyperBall]]).
  *
  * [[graft.ops.Hll.hllDistinct]] keeps registers as (group, bucket, m_j)
  * ROWS — right for one aggregation pass, where the bucket is just
  * another group key. An algorithm that MAINTAINS a sketch per node
  * across rounds would pay that shape per round: joining a node's
  * registers to its edges replicates ≤256 rows per edge, and the
  * per-(node, bucket) shuffle carries ~30 B of row overhead per 1-byte
  * register (measured: the row-shaped HyperBall read 23 s at sf0.1 where
  * the exact 3-hop BFS reads 3.6 s). Packing the 256 registers into ONE
  * `array<int>` makes the join emit one row per edge and this aggregate
  * the merge: partial-aggregatable (map-side combine merges each node's
  * in-neighbor sketches BEFORE the shuffle — the mergeable-summaries
  * property HLL registers have by construction), fixed 1 KB state, and
  * the register max runs as a primitive loop, never a per-bucket
  * hash-map probe.
  *
  * Register VALUES are unchanged from the row form (same md5 bucket/rho,
  * same max semantics), so estimates derived from the packed array are
  * digit-identical to the row-shaped fold and a row-shaped SQL oracle
  * reproduces them. */
case class RegisterMax(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]]
  with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  private val m = 256

  override def prettyName: String = "register_max"
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(IntegerType))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(arr.numElements(), m)
      var i = 0
      while (i < n) {
        val x = arr.getInt(i)
        if (x > buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Int]): Any =
    new GenericArrayData(buf.map(Int.box): Array[Any])

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(m * 4)
    var i = 0
    while (i < m) { bb.putInt(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Int](m)
    var i = 0
    while (i < m) { buf(i) = bb.getInt; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): RegisterMax =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): RegisterMax =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}

object RegisterMax {
  /** Column API: elementwise max of 256-slot register arrays. */
  def registerMax(arr: Column): Column =
    ColumnBridge.column(
      RegisterMax(ColumnBridge.expression(arr)).toAggregateExpression())
}
