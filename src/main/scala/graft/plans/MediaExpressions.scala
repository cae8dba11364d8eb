package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native expressions over opaque media `binary` columns.
  *
  * Unlike PNG/WAV (fixed header offsets, expressible with `substring`+`conv`
  * column functions — see graft.multimodal), JPEG dimensions live in an SOF
  * segment at a VARIABLE offset: the parser must walk the segment chain
  * (marker, 2-byte big-endian length, skip) until it hits a start-of-frame.
  * That loop is a natural single-pass expression — one tight JVM scan per
  * row in the scan stage, no UDF serialization, no regex over binary.
  * Reference for the multimodal surface: pypeman treats payloads as opaque
  * bytes (`message.py:16`); this is the typed-metadata layer SURVEY §2.6
  * adds on top.
  */
case class JpegMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("progressive", BooleanType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_meta"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    def u(i: Int): Int = b(i) & 0xff
    if (b.length < 4 || u(0) != 0xff || u(1) != 0xd8) return null
    var i = 2
    while (i + 3 < b.length) {
      if (u(i) != 0xff) return null // desynchronized — not a valid stream
      val m = u(i + 1)
      if (m == 0xff) i += 1 // fill byte before a marker
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2 // standalone
      else if (m == 0xd9 || m == 0xda) return null // EOI/SOS before any SOF
      else {
        val len = (u(i + 2) << 8) | u(i + 3)
        if (len < 2 || i + 2 + len > b.length) return null // truncated
        // SOF0..SOF15 minus DHT(C4)/JPG(C8)/DAC(CC); payload is
        // [precision, height:2BE, width:2BE, ncomp, ...]
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (len < 7) return null
          val h = (u(i + 5) << 8) | u(i + 6)
          val w = (u(i + 7) << 8) | u(i + 8)
          return InternalRow(w.toLong, h.toLong, m == 0xc2)
        }
        i += 2 + len
      }
    }
    null
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MediaNative {
  import ColumnBridge.{column => c, expression => e}

  def jpegMeta(bin: Column): Column = c(JpegMeta(e(bin)))
}
