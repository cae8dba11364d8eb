package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Partial-aggregatable element-wise vector mean — the pooling step of an
  * embedding pipeline (chunk→document pooling, per-class centroids,
  * k-means recompute).
  *
  * The declarative alternative (`posexplode` + `groupBy(key, dim)` +
  * `avg` + re-collect) shuffles n·dims rows and needs a second shuffle to
  * reassemble vectors. This aggregate keeps one running (sum[dims], count)
  * buffer per group: map-side partials mean only num_groups·dims doubles
  * cross the network, and vectors come out assembled — at 100 TB the
  * difference between shuffling the corpus and shuffling kilobytes.
  *
  * Accepts `array<float>` or `array<double>` input; sums in double.
  * Rows with null vectors are ignored; groups with only nulls yield null.
  * All input vectors of a group must share one dimensionality (enforced).
  */
case class VecMean(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecMean.Buf] {

  override def prettyName: String = "vec_mean"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"vec_mean needs array<float|double>, got $t")
  }

  override def createAggregationBuffer(): VecMean.Buf = new VecMean.Buf

  override def update(buf: VecMean.Buf, input: InternalRow): VecMean.Buf = {
    val v = child.eval(input).asInstanceOf[ArrayData]
    if (v != null) {
      val d = v.numElements()
      if (buf.sum == null) buf.sum = new Array[Double](d)
      require(buf.sum.length == d,
        s"vec_mean: mixed dimensionality ${buf.sum.length} vs $d")
      var i = 0
      while (i < d) {
        buf.sum(i) += (if (elemIsFloat) v.getFloat(i).toDouble else v.getDouble(i))
        i += 1
      }
      buf.n += 1
    }
    buf
  }

  override def merge(buf: VecMean.Buf, other: VecMean.Buf): VecMean.Buf = {
    if (other.sum != null) {
      if (buf.sum == null) { buf.sum = other.sum.clone(); buf.n = other.n }
      else {
        require(buf.sum.length == other.sum.length,
          s"vec_mean: mixed dimensionality ${buf.sum.length} vs ${other.sum.length}")
        var i = 0
        while (i < buf.sum.length) { buf.sum(i) += other.sum(i); i += 1 }
        buf.n += other.n
      }
    }
    buf
  }

  override def eval(buf: VecMean.Buf): Any =
    if (buf.sum == null) null
    else new GenericArrayData(buf.sum.map(_ / buf.n))

  override def serialize(buf: VecMean.Buf): Array[Byte] = {
    val d = if (buf.sum == null) 0 else buf.sum.length
    val bb = java.nio.ByteBuffer.allocate(12 + d * 8)
    bb.putLong(buf.n)
    bb.putInt(d)
    var i = 0
    while (i < d) { bb.putDouble(buf.sum(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecMean.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new VecMean.Buf
    buf.n = bb.getLong
    val d = bb.getInt
    // sum == null ⟺ n == 0 is the buffer invariant: a group whose rows
    // are all zero-length arrays has d = 0 with n > 0 and must round-trip
    // to a NON-null empty sum, or merge would drop its count and eval
    // would return null after a shuffle of partials (but an empty array
    // in map-side-only execution).
    if (d > 0 || buf.n > 0) {
      buf.sum = new Array[Double](d)
      var i = 0
      while (i < d) { buf.sum(i) = bb.getDouble; i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VecMean =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecMean =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}

object VecMean {
  final class Buf {
    var sum: Array[Double] = null
    var n: Long = 0L
  }

  /** Column API: element-wise mean vector per group, as array<double>. */
  def vecMean(v: Column): Column =
    ColumnBridge.column(
      VecMean(ColumnBridge.expression(v)).toAggregateExpression())
}
