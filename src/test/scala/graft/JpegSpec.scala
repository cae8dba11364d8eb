package graft

import graft.multimodal.{Jpeg, Multimodal, Png}
import org.apache.spark.sql.functions._

/** Real-JPEG decode correctness. JPEG is lossy, so unlike PngSpec the
  * anchors are tolerance contracts, not exact samples — pinned from the
  * decoded buffer per the per-JDK-determinism caveat:
  *  - dimensions and channel count roundtrip EXACTLY (lossless in JPEG);
  *  - solid fills decode within a small tolerance of the source (every
  *    8×8 block is DC-only → error ≤ quantStep/16);
  *  - band order is R,G,B (an r≠b asymmetric color would expose a BGR
  *    mixup);
  *  - failure lanes (garbage, truncation, hostile dims) → None, never a
  *    throw.
  */
class JpegSpec extends SparkSpec {

  test("solid gray roundtrip: exact dims, 1 channel, values within ±4") {
    for (v <- Seq(0, 7, 100, 200, 255); (w, h) <- Seq((8, 8), (13, 9), (1, 1))) {
      val bytes = Jpeg.encodeSolid(w, h, 1, Array(v))
      val img = Jpeg.decode(bytes).getOrElse(fail(s"decode failed v=$v ${w}x$h"))
      assert(img.width == w && img.height == h && img.channels == 1)
      assert(img.pixels.length == w * h)
      img.pixels.foreach(p => assert(math.abs(p - v) <= 4,
        s"gray $v decoded to $p (${w}x$h) — outside DC-only tolerance"))
    }
  }

  test("solid RGB roundtrip: exact dims, 3 channels in R,G,B order, ±8") {
    // asymmetric color: a band-order mixup (BGR read as RGB) would be
    // ~190 off on channels 0/2, far outside the gate
    val (r, g, b) = (200, 32, 10)
    val bytes = Jpeg.encodeSolid(10, 6, 3, Array(r, g, b))
    val img = Jpeg.decode(bytes).getOrElse(fail("decode failed"))
    assert(img.width == 10 && img.height == 6 && img.channels == 3)
    val want = Array(r, g, b)
    img.pixels.zipWithIndex.foreach { case (p, i) =>
      assert(math.abs(p - want(i % 3)) <= 8,
        s"band ${i % 3}: $p vs ${want(i % 3)} — YCbCr roundtrip out of gate")
    }
  }

  test("garbage, truncation, non-JPEG and hostile dims → None, not throw") {
    assert(Jpeg.decode("notajpeg".getBytes).isEmpty)
    assert(Jpeg.decode(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
    val good = Jpeg.encodeSolid(8, 8, 1, Array(128))
    assert(Jpeg.decode(good).isDefined)
    assert(Jpeg.decode(good.take(good.length / 2)).isEmpty,
      "truncated entropy stream must map to None")
    // PNG bytes must NOT take the JPEG lane (signature gate)
    val png = Png.encode(2, 2, 1, 0, Array(1, 2, 3, 4))
    assert(Jpeg.decode(png).isEmpty)
    // hostile SOF dims: patch width/height to 0x7fff each →
    // w·h·4 ≈ 4.3e9 > maxPixels must be refused BEFORE pixel decode
    val patched = good.clone()
    val sof = (0 until patched.length - 1).find(i =>
      (patched(i) & 0xff) == 0xff && (patched(i + 1) & 0xff) == 0xc0).get
    // SOF0 layout: FFC0 len16 prec h16 w16 ...
    patched(sof + 5) = 0x7f.toByte; patched(sof + 6) = 0xff.toByte
    patched(sof + 7) = 0x7f.toByte; patched(sof + 8) = 0xff.toByte
    assert(Jpeg.decode(patched).isEmpty, "oversize dims must be refused")
  }

  test("jpegPixelStats over a DataFrame: dims exact, stats sane, loud failures") {
    implicit val s = spark
    import spark.implicits._
    val rows = Seq(
      (1L, Jpeg.encodeSolid(9, 4, 1, Array(50))),
      (2L, Jpeg.encodeSolid(8, 8, 3, Array(10, 100, 250))),
      (3L, "garbage".getBytes))
    val out = Multimodal.jpegPixelStats(rows.toDF("doc_id", "jpg"),
      "doc_id", "jpg").collect().sortBy(_.id)
    assert(out(0).width == 9 && out(0).height == 4 && out(0).channels == 1)
    // 36 samples of ~50: sum within 36·4 of 1800, min/max within ±4
    assert(math.abs(out(0).px_sum - 9L * 4 * 50) <= 9 * 4 * 4)
    assert(out(0).px_min >= 46 && out(0).px_max <= 54)
    assert(out(1).channels == 3 && out(1).px_min <= 18 && out(1).px_max >= 242)
    assert(out(2).width == -1L, "decode failure must be loud")
  }

  test("SelfClosingIterator: abandoned take() releases via close(); " +
      "exhaustion and throw self-close; close idempotent") {
    // abandonment fixture: stop after 1 of 3 via take, never drain —
    // caller-invocable close must release the resource exactly once
    var closes = 0
    val it = new Multimodal.SelfClosingIterator(
      Iterator(1, 2, 3), () => closes += 1)
    val taken = it.take(1).toList
    assert(taken == List(1) && closes == 0, "not yet exhausted, not closed")
    it.close()
    assert(closes == 1, "caller-invocable close releases")
    it.close()
    assert(closes == 1, "close is idempotent")
    // exhaustion self-closes without an explicit close
    var c2 = 0
    val it2 = new Multimodal.SelfClosingIterator(Iterator(1), () => c2 += 1)
    assert(it2.toList == List(1) && c2 == 1, "closed on exhaustion")
    // a throw mid-iteration self-closes too
    var c3 = 0
    val boom = Iterator(1) ++ Iterator.continually[Int](
      throw new RuntimeException("boom"))
    val it3 = new Multimodal.SelfClosingIterator(boom, () => c3 += 1)
    it3.next()
    intercept[RuntimeException](it3.next())
    assert(c3 == 1, "closed on throw")
  }

  test("extractFeatures uses real pixels for JPEG payloads") {
    implicit val s = spark
    import spark.implicits._
    val jpg = Jpeg.encodeSolid(16, 16, 1, Array(100))
    val media = Seq(Multimodal.Media(7L, jpg, "image/jpeg")).toDS()
    val f = Multimodal.extractFeatures(media).collect().head.features
    // ch0 mean ≈ 100/255 (±4/255 lossy gate); dims exact
    assert(math.abs(f(0) - 100 / 255.0f) < 4 / 255.0f + 1e-6)
    assert(f(6) == 16.0f && f(7) == 16.0f)
  }
}
