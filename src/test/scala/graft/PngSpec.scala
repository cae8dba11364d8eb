package graft

import java.util.zip.CRC32

import graft.multimodal.{Multimodal, Png}

/** Real-PNG decode correctness.
  *
  * Two independent anchors so encoder/decoder bugs can't cancel:
  *  1. HAND-BUILT fixtures — PNG byte streams assembled here from the
  *     RFC 2083 definitions (stored-mode zlib blocks, filter bytes
  *     computed by hand per the spec formulas in the comments), never
  *     touching [[Png.encode]]. A decoder that mis-inverts a filter
  *     fails these even if it agrees with the encoder.
  *  2. Roundtrips through [[Png.encode]] across every filter type and
  *     color type, which additionally exercises real deflate streams.
  */
class PngSpec extends SparkSpec {

  /** Build a minimal PNG by hand: signature + IHDR + one IDAT holding a
    * STORED-mode zlib stream of `filtered` (the raw filtered scanlines,
    * filter byte included per row) + IEND. Only java.util.zip checksums
    * are used — no call into Png.encode. */
  private def handPng(
      w: Int, h: Int, colorType: Int, filtered: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be(v: Int): Array[Byte] = Array(
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be(data.length))
      val tb = typ.getBytes("US-ASCII")
      out.write(tb); out.write(data)
      val crc = new CRC32(); crc.update(tb); crc.update(data)
      out.write(be(crc.getValue.toInt))
    }
    val ihdr = be(w) ++ be(h) ++ Array[Byte](8, colorType.toByte, 0, 0, 0)
    chunk("IHDR", ihdr)
    // zlib stored block: CMF=0x78 FLG=0x01, then deflate stored:
    // BFINAL=1/BTYPE=00 (byte 0x01), LEN le16, NLEN = ~LEN, raw data,
    // then Adler-32 (big-endian) of the UNCOMPRESSED data.
    val n = filtered.length
    val z = new java.io.ByteArrayOutputStream()
    z.write(0x78); z.write(0x01)
    z.write(0x01); z.write(n & 0xff); z.write((n >> 8) & 0xff)
    z.write(~n & 0xff); z.write((~n >> 8) & 0xff)
    z.write(filtered)
    z.write(be(Png.adler32(filtered).toInt))
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("hand-built gray 2x2 with Up filter decodes to spec pixels") {
    // raw pixels rows: [10, 20], [30, 45]
    // row0 filter 0 (None): bytes 10, 20
    // row1 filter 2 (Up): Up(x) = Raw(x) - Prior(x) mod 256 → 30-10=20,
    //   45-20=25
    val filtered = Array[Byte](0, 10, 20, 2, 20, 25)
    val img = Png.decode(handPng(2, 2, colorType = 0, filtered)).get
    assert(img.width == 2 && img.height == 2 && img.channels == 1)
    assert(img.pixels.toSeq == Seq(10, 20, 30, 45))
  }

  test("hand-built gray 3x1 with Sub filter decodes to spec pixels") {
    // raw row: [100, 150, 250]; Sub(x) = Raw(x) - Raw(x-bpp) mod 256
    // → 100, 50, 100
    val filtered = Array[Byte](1, 100.toByte, 50, 100.toByte)
    val img = Png.decode(handPng(3, 1, colorType = 0, filtered)).get
    assert(img.pixels.toSeq == Seq(100, 150, 250))
  }

  test("hand-built RGB 2x2 with Average and Paeth rows decodes to spec") {
    // RGB, bpp=3. Raw rows:
    //   row0: (10,20,30) (40,60,80)
    //   row1: (50,50,50) (60,70,90)
    // row0 filter 3 (Average): pred = floor((left + above)/2), above=0
    //   px0: left=0 → pred 0,0,0 → 10,20,30
    //   px1: left=(10,20,30) → pred (5,10,15) → 35,50,65
    // row1 filter 4 (Paeth): pred = paeth(left, above, above-left)
    //   px0: a=0,b=row0 px0,c=0 → paeth picks b (pa=|a+b-c-a|=b? —
    //     p=0+b-0=b, pa=|b-0|=b? no: pa=|p-a|=b, pb=|p-b|=0, pc=|p-c|=b
    //     → picks b=(10,20,30)) → 50-10=40, 50-20=30, 50-30=20
    //   px1: a=(50,50,50), b=(40,60,80), c=(10,20,30);
    //     p=a+b-c=(80,90,100); pa=|p-a|=(30,40,50); pb=|p-b|=(40,30,20);
    //     pc=|p-c|=(70,70,70) → picks (a,b,b)=(50,60,80)
    //     → 60-50=10, 70-60=10, 90-80=10
    val filtered = Array[Byte](
      3, 10, 20, 30, 35, 50, 65,
      4, 40, 30, 20, 10, 10, 10)
    val img = Png.decode(handPng(2, 2, colorType = 2, filtered)).get
    assert(img.channels == 3)
    assert(img.pixels.toSeq ==
      Seq(10, 20, 30, 40, 60, 80, 50, 50, 50, 60, 70, 90))
  }

  test("corrupt CRC, bad signature, palette type, truncation all → None") {
    val good = handPng(2, 1, 0, Array[Byte](0, 1, 2))
    assert(Png.decode(good).isDefined)
    // flip a byte inside the IDAT payload: the chunk CRC (computed over
    // type+data, verified before inflate) must catch it
    val badData = good.clone(); badData(8 + 25 + 8 + 2) =
      (badData(8 + 25 + 8 + 2) ^ 0x55).toByte
    assert(Png.decode(badData).isEmpty, "CRC mismatch must fail")
    assert(Png.decode("notapng".getBytes).isEmpty)
    assert(Png.decode(good.take(20)).isEmpty)
    val palette = handPng(2, 1, 3, Array[Byte](0, 1, 2))
    assert(Png.decode(palette).isEmpty, "palette unsupported → None")
  }

  test("encode/decode roundtrip across all filters and color types") {
    for (ch <- Seq(1, 2, 3, 4); f <- 0 to 4) {
      val w = 5; val h = 4
      val px = Array.tabulate(w * h * ch)(p => (p * 37 + ch * 11 + f) % 256)
      val img = Png.decode(Png.encode(w, h, ch, f, px))
        .getOrElse(fail(s"decode failed ch=$ch f=$f"))
      assert(img.width == w && img.height == h && img.channels == ch)
      assert(img.pixels.toSeq == px.toSeq, s"pixels ch=$ch f=$f")
    }
  }

  test("hostile chunk length near Int.MaxValue → None, not a throw") {
    // A length field of 0x7ffffff0 would make `off + 12 + len` wrap
    // negative in a naive bounds check, passing the guard and then
    // throwing from CRC32.update. The guard must compare without
    // overflow and return None.
    val good = handPng(2, 1, 0, Array[Byte](0, 1, 2))
    val hostile = good.clone()
    // first chunk's length field lives at offset 8..11 (IHDR)
    hostile(8) = 0x7f.toByte; hostile(9) = 0xff.toByte
    hostile(10) = 0xff.toByte; hostile(11) = 0xf0.toByte
    assert(Png.decode(hostile).isEmpty)
  }

  test("oversize IHDR is refused, not allocated") {
    // 1<<14 x 1<<14 RGBA = 2^30 samples > maxPixels
    val big = Png.encode(2, 2, 4, 0, Array.fill(16)(0))
    // patch width/height in IHDR (offsets 16..19 / 20..23) to 1<<14
    val patched = big.clone()
    def putBe(off: Int, v: Int): Unit = {
      patched(off) = (v >>> 24).toByte; patched(off + 1) = (v >>> 16).toByte
      patched(off + 2) = (v >>> 8).toByte; patched(off + 3) = v.toByte
    }
    putBe(16, 1 << 14); putBe(20, 1 << 14)
    // fix the IHDR CRC so the size guard (not the CRC) is what trips
    val crc = new CRC32(); crc.update(patched, 12, 4 + 13)
    putBe(29, crc.getValue.toInt)
    assert(Png.decode(patched).isEmpty)
  }

  test("pngPixelStats over a DataFrame: exact stats + loud failures") {
    implicit val s = spark
    import spark.implicits._
    val rows = Seq(
      (1L, Png.encode(2, 2, 1, 2, Array(10, 20, 30, 45))),
      (2L, "garbage".getBytes))
    val df = rows.toDF("doc_id", "png")
    val out = Multimodal.pngPixelStats(df, "doc_id", "png")
      .collect().sortBy(_.id)
    assert(out(0) == Multimodal.PngStats(1L, 2, 2, 1, 105, 10, 45, 105))
    assert(out(1).width == -1L, "decode failure must be loud")
  }

  test("extractFeatures uses real pixels for PNG payloads") {
    implicit val s = spark
    import spark.implicits._
    // constant-100 gray image → channel-0 mean 100/255, min=max=100/255
    val png = Png.encode(4, 4, 1, 1, Array.fill(16)(100))
    val media = Seq(Multimodal.Media(7L, png, "image/png")).toDS()
    val f = Multimodal.extractFeatures(media).collect().head.features
    assert(math.abs(f(0) - 100 / 255.0f) < 1e-6)
    assert(math.abs(f(4) - 100 / 255.0f) < 1e-6)
    assert(math.abs(f(5) - 100 / 255.0f) < 1e-6)
    assert(f(6) == 4.0f && f(7) == 4.0f)
  }
}
