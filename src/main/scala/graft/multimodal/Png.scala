package graft.multimodal

import java.util.zip.{Adler32, CRC32, Deflater, Inflater}

/** REAL PNG pixel codec — no image library, only `java.util.zip`
  * (Inflater/Deflater are part of the JDK). Closes the one remaining
  * multimodal stub: image payloads now decode to actual pixels, like
  * [[Multimodal.wavPcmFrames]] decodes actual PCM samples.
  *
  * Scope (the canonical subset a training-data pipeline meets):
  * 8-bit-depth, non-interlaced, color types 0 (gray), 2 (RGB),
  * 4 (gray+alpha), 6 (RGBA). Palette (3) and sub-byte depths return
  * None — loud, not silently wrong. The decoder verifies chunk CRCs and
  * the zlib Adler-32 (via Inflater), walks the chunk chain, inflates the
  * concatenated IDAT stream, and inverts all five scanline filters
  * (None/Sub/Up/Average/Paeth) exactly per the PNG spec, RFC 2083 §6.
  *
  * Scale shape: decode runs inside `mapPartitions` (see
  * [[Multimodal.pngPixelStats]]) so parallelism is the scan's; per-task
  * transient memory is O(width·height·channels) for the image being
  * decoded — bounded by `maxPixels` (decode refuses larger images rather
  * than risking an executor OOM on a hostile/corrupt header).
  *
  * Reference behavior anchor: pypeman treats binary payloads as opaque
  * (`pypeman/message.py` stores payload bytes untyped); the decode tier
  * is part of the training-data extension surface, not a port.
  */
object Png {

  /** Decoded image: `pixels` row-major, channel-interleaved, values
    * 0..255 (stored in an Int array to avoid sign traps downstream). */
  final case class Image(
      width: Int, height: Int, channels: Int, pixels: Array[Int])

  private val Signature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Refuse to decode images larger than this many samples (w·h·ch):
    * a corrupt/hostile IHDR must not allocate executor-killing buffers. */
  val maxPixels: Int = 1 << 26 // 64M samples = 64 MB recon buffer

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // RGB
    case 4 => 2 // gray + alpha
    case 6 => 4 // RGBA
    case _ => -1 // palette (3) and anything else: unsupported
  }

  /** a=left, b=above, c=above-left — RFC 2083 §6.6. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode PNG bytes to pixels. None on: bad signature, unsupported
    * shape (palette / bit depth ≠ 8 / interlaced), CRC mismatch,
    * truncated or over-`maxPixels` streams, or inflate failure. */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (bytes == null || bytes.length < 8) return None
    var i = 0
    while (i < 8) { if (bytes(i) != Signature(i)) return None; i += 1 }

    var off = 8
    var width = 0; var height = 0; var channels = -1
    var ok = true; var sawEnd = false
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new CRC32()
    while (ok && !sawEnd && off + 12 <= bytes.length) {
      val len = beInt(bytes, off)
      // `bytes.length - off - 12` is non-negative here (loop guard), so this
      // comparison cannot overflow — unlike `off + 12 + len > bytes.length`,
      // which wraps negative for hostile lengths near Int.MaxValue.
      if (len < 0 || len > bytes.length - off - 12) { ok = false }
      else {
        val typ = new String(bytes, off + 4, 4, "US-ASCII")
        crc.reset()
        crc.update(bytes, off + 4, 4 + len)
        if (crc.getValue.toInt != beInt(bytes, off + 8 + len)) ok = false
        else typ match {
          case "IHDR" =>
            if (len != 13) ok = false
            else {
              width = beInt(bytes, off + 8)
              height = beInt(bytes, off + 12)
              val bitDepth = bytes(off + 16) & 0xff
              channels = channelsOf(bytes(off + 17) & 0xff)
              val interlace = bytes(off + 20) & 0xff
              if (bitDepth != 8 || channels < 0 || interlace != 0 ||
                width <= 0 || height <= 0 ||
                width.toLong * height * channels > maxPixels) ok = false
            }
          case "IDAT" => idat.write(bytes, off + 8, len)
          case "IEND" => sawEnd = true
          case _ => () // ancillary chunk: skip
        }
        off += 12 + len
      }
    }
    if (!ok || !sawEnd || channels < 0) return None

    // zlib-inflate the filtered scanline stream (Adler-32 verified by
    // Inflater's wrapped mode)
    val rowBytes = width * channels
    val raw = new Array[Byte]((1 + rowBytes) * height)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) return None // truncated
        got += n
      }
      if (got != raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()

    // Unfilter. bpp = channels at depth 8 (RFC 2083 §6.3).
    val recon = new Array[Int](rowBytes * height)
    val bpp = channels
    var r = 0
    while (r < height) {
      val f = raw(r * (1 + rowBytes)) & 0xff
      if (f > 4) return None
      var k = 0
      while (k < rowBytes) {
        val x = raw(r * (1 + rowBytes) + 1 + k) & 0xff
        val a = if (k >= bpp) recon(r * rowBytes + k - bpp) else 0
        val b = if (r > 0) recon((r - 1) * rowBytes + k) else 0
        val c = if (r > 0 && k >= bpp) recon((r - 1) * rowBytes + k - bpp) else 0
        val v = f match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + ((a + b) >>> 1)
          case 4 => x + paeth(a, b, c)
        }
        recon(r * rowBytes + k) = v & 0xff
        k += 1
      }
      r += 1
    }
    Some(Image(width, height, channels, recon))
  }

  /** Encode pixels (row-major, channel-interleaved, values 0..255) as a
    * valid PNG, applying `filterType` (0..4) to every scanline — the
    * write-path inverse of [[decode]], used by specs/queries to
    * synthesize streams with every filter exercised. Deterministic:
    * Deflater level 6 with a fixed strategy. */
  def encode(
      width: Int, height: Int, channels: Int, filterType: Int,
      pixels: Array[Int]): Array[Byte] = {
    require(filterType >= 0 && filterType <= 4, s"bad filter $filterType")
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case n => throw new IllegalArgumentException(s"bad channels $n")
    }
    val rowBytes = width * channels
    require(pixels.length == rowBytes * height, "pixel buffer shape")
    val bpp = channels
    val filtered = new Array[Byte]((1 + rowBytes) * height)
    var r = 0
    while (r < height) {
      filtered(r * (1 + rowBytes)) = filterType.toByte
      var k = 0
      while (k < rowBytes) {
        val x = pixels(r * rowBytes + k)
        val a = if (k >= bpp) pixels(r * rowBytes + k - bpp) else 0
        val b = if (r > 0) pixels((r - 1) * rowBytes + k) else 0
        val c = if (r > 0 && k >= bpp) pixels((r - 1) * rowBytes + k - bpp) else 0
        val pred = filterType match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >>> 1
          case 4 => paeth(a, b, c)
        }
        filtered(r * (1 + rowBytes) + 1 + k) = ((x - pred) & 0xff).toByte
        k += 1
      }
      r += 1
    }

    // zlib-deflate the filtered stream
    val def_ = new Deflater(6)
    def_.setInput(filtered); def_.finish()
    val zb = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!def_.finished()) zb.write(buf, 0, def_.deflate(buf))
    def_.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    def writeChunk(typ: String, data: Array[Byte]): Unit = {
      def be(v: Int): Array[Byte] = Array(
        (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      out.write(be(data.length))
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new CRC32(); crc.update(tb); crc.update(data)
      out.write(be(crc.getValue.toInt))
    }
    val ihdr = new Array[Byte](13)
    def putBe(arr: Array[Byte], off: Int, v: Int): Unit = {
      arr(off) = (v >>> 24).toByte; arr(off + 1) = (v >>> 16).toByte
      arr(off + 2) = (v >>> 8).toByte; arr(off + 3) = v.toByte
    }
    putBe(ihdr, 0, width); putBe(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = colorType.toByte // depth 8, colorType
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0 // deflate, adaptive, no interlace
    writeChunk("IHDR", ihdr)
    writeChunk("IDAT", zb.toByteArray)
    writeChunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** zlib Adler-32 of raw bytes — exposed for spec fixtures that build
    * stored-block zlib streams by hand. */
  def adler32(data: Array[Byte]): Long = {
    val a = new Adler32(); a.update(data); a.getValue
  }
}
