package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Hilbert-curve index — the hot-path form of
  * [[graft.ops.Layout.hilbertIndex]]'s column fold: one tight per-row
  * integer loop over the bit levels (classic xy2d; Hamilton's curve)
  * instead of 16 interpreted higher-order-function steps. The HOF fold
  * is kept as the differential oracle twin (same recursion, same
  * results — a spec pins equality), exactly the JpegMeta/wavPcmFrames
  * pattern: composable column form proves the semantics, the native
  * expression carries the scan-stage cost at corpus scale (measured
  * 4.4× on the q_hilbert shape at sf0.1: 2.13 s → 0.48 s).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with CodegenFallback {

  require(bits >= 1 && bits <= 31, s"bits in [1,31], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(xAny: Any, yAny: Any): Any = {
    val n = 1L << bits
    var x = xAny.asInstanceOf[Long]
    var y = yAny.asInstanceOf[Long]
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LayoutNative {
  def hilbertIndex(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(HilbertIndex(
      ColumnBridge.expression(x.cast("long")),
      ColumnBridge.expression(y.cast("long")), bits))
}
