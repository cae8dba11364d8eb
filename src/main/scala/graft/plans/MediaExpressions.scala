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

/** MP4 / ISO-BMFF (ISO 14496-12) movie-header metadata: walks the
  * top-level box chain (32-bit big-endian size + fourcc; size==1 →
  * 64-bit largesize follows; size==0 → box runs to EOF) to `moov`, then
  * its children to `mvhd`, and reads timescale/duration at the
  * version-dependent offsets (v0: 32-bit times, v1: 64-bit). Null on
  * anything malformed/truncated — corrupt rows filter out instead of
  * failing the scan. Same rationale as [[JpegMeta]]: variable offsets
  * need a walk, and a native single-pass expression keeps it in the
  * scan stage. */
case class Mp4Meta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("timescale", LongType, nullable = false),
    StructField("duration", LongType, nullable = false),
    StructField("version", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "mp4_meta"

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    def u(i: Int): Long = b(i) & 0xffL
    def be32(i: Int): Long = (u(i) << 24) | (u(i + 1) << 16) | (u(i + 2) << 8) | u(i + 3)
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def fourcc(i: Int): String = new String(b, i, 4, "ISO-8859-1")

    def findMvhd(lo: Int, hi: Int): Any = {
      var j = lo
      while (j + 8 <= hi) {
        var size = be32(j)
        var hdr = 8
        if (size == 1) {
          if (j + 16 > hi) return null
          size = be64(j + 8); hdr = 16
        } else if (size == 0) size = (hi - j).toLong
        if (size < hdr || j + size > hi) return null
        if (fourcc(j + 4) == "mvhd") {
          if (size < hdr + 4) return null
          val version = u(j + hdr).toInt
          if (version == 0) {
            if (size < hdr + 20) return null
            return InternalRow(be32(j + hdr + 12), be32(j + hdr + 16), 0)
          } else if (version == 1) {
            if (size < hdr + 32) return null
            return InternalRow(be32(j + hdr + 20), be64(j + hdr + 24), 1)
          } else return null
        }
        j += size.toInt
      }
      null
    }

    var i = 0
    while (i + 8 <= b.length) {
      var size = be32(i)
      var hdr = 8
      if (size == 1) {
        if (i + 16 > b.length) return null
        size = be64(i + 8); hdr = 16
      } else if (size == 0) size = (b.length - i).toLong
      if (size < hdr || i + size > b.length) return null
      if (fourcc(i + 4) == "moov") return findMvhd(i + hdr, i + size.toInt)
      i += size.toInt
    }
    null
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MediaNative {
  import ColumnBridge.{column => c, expression => e}

  def jpegMeta(bin: Column): Column = c(JpegMeta(e(bin)))

  def mp4Meta(bin: Column): Column = c(Mp4Meta(e(bin)))
}
