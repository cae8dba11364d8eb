package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.stream.MemoryCacheImageOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** REAL JPEG pixel codec over `javax.imageio` — the JDK ships a full
  * baseline/progressive JPEG decoder, so unlike PNG ([[Png]], hand-built
  * on Inflater) nothing needs re-implementing: this wrapper adds only the
  * contracts the pipeline tier requires — a None-not-throw failure mode,
  * the [[Png.maxPixels]] allocation guard enforced BEFORE pixel decode
  * (reader header probe, so a hostile SOF can't size the buffer), and a
  * fixed R,G,B band order in the returned interleaved array.
  *
  * This closes the last decode stub: PNG pixels, WAV PCM, JPEG headers,
  * MP4 boxes and now JPEG pixels all decode from real bytes. The only
  * remaining fake in the multimodal tier is [[Multimodal.fallbackFeatures]]
  * for formats with no JDK codec (H.264 et al.).
  *
  * JPEG is LOSSY: unlike [[Png.decode]], decoded samples are within a few
  * counts of the encoded source, not equal — exact values depend on the
  * JDK's IDCT and are only per-JDK deterministic. Oracle-facing queries
  * therefore check closed-form DIMENSIONS exactly plus a tolerance
  * verdict on values (see CodecQueries.qJpegPixels), never raw samples.
  *
  * Scale shape: both directions run inside `mapPartitions`
  * ([[Multimodal.jpegPixelStats]]), parallelism is the scan's, transient
  * memory one image bounded by [[Png.maxPixels]]. `ImageIO` disk caching
  * is disabled (`setUseCache(false)` would be global; we pass memory
  * streams explicitly instead) so no temp-file I/O per image.
  *
  * Reference behavior anchor: pypeman treats binary payloads as opaque
  * (`pypeman/message.py`); the decode tier is training-data extension
  * surface, not a port.
  */
object Jpeg {

  private val MaxPixels: Long = Png.maxPixels.toLong

  /** Decode JPEG bytes to interleaved pixels (R,G,B or gray band order,
    * values 0..255). None on: missing/short SOI signature, no JDK reader,
    * over-[[Png.maxPixels]] dimensions (checked from the header BEFORE
    * allocating pixels), or any decoder error (truncated/corrupt stream).
    *
    * One-shot convenience — creates and disposes a fresh reader. Batch
    * callers ([[Multimodal.jpegPixelStats]]) hold one [[Decoder]] per
    * partition instead: `ImageIO.getImageReadersByFormatName` is a
    * service-registry lookup and the reader itself carries reusable
    * Huffman/IDCT work buffers, so per-image construction was pure
    * overhead on million-image scans. */
  def decode(bytes: Array[Byte]): Option[Png.Image] = {
    val dec = decoder()
    try dec.decode(bytes)
    finally dec.close()
  }

  /** A reusable JPEG decoder (one `ImageReader`): create once per
    * partition inside `mapPartitions`, call per row, close in the
    * partition epilogue — the decode-side sibling of [[Encoder]]. */
  final class Decoder private[Jpeg] () {
    // null when no JPEG ImageReader SPI is registered (headless JREs
    // stripped of imageio plugins): decode() then yields None per image —
    // the one-shot decode() contract — instead of a NoSuchElementException
    // failing the whole task at decoder construction
    private val reader = {
      val it = ImageIO.getImageReadersByFormatName("jpeg")
      if (it.hasNext) it.next() else null
    }

    def decode(bytes: Array[Byte]): Option[Png.Image] = {
      if (reader == null) return None
      if (bytes == null || bytes.length < 4 ||
        (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return None
      // explicit memory-backed stream: ImageIO.createImageInputStream
      // consults the global stream-SPI registry and may spill to a temp
      // FILE cache — a per-image disk write on the scan path
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis, true, true)
        val w = reader.getWidth(0)
        val h = reader.getHeight(0)
        // the channel count isn't known until decode; bound by the worst
        // case (4: CMYK streams exist in the wild) so the guard is sound
        if (w <= 0 || h <= 0 || w.toLong * h * 4 > MaxPixels) return None
        val img = reader.read(0)
        val raster = img.getRaster
        val ch = raster.getNumBands
        // bulk raster read, not a per-sample getSample(x,y,b) triple loop
        // (measured 3-5× on the decode path): getPixels fills the full
        // interleaved (pixel-major, band-minor) array in one call, and the
        // SampleModel band order follows the ColorModel's component order
        // (R,G,B even for TYPE_3BYTE_BGR storage) — and raw samples,
        // unlike getRGB, skip the gray→sRGB ICC transform
        val out = raster.getPixels(raster.getMinX, raster.getMinY, w, h,
          new Array[Int](w * h * ch))
        Some(Png.Image(w, h, ch, out))
      } catch {
        case _: Exception => None // truncated/corrupt entropy stream etc.
      } finally {
        // drop the dead input reference so a held per-partition decoder
        // doesn't pin the previous image's stream between rows
        try reader.setInput(null) catch { case _: Exception => () }
        iis.close()
      }
    }

    def close(): Unit = if (reader != null) reader.dispose()
  }

  def decoder(): Decoder = new Decoder()

  /** Encode a SOLID-color image as a real JPEG (gray for `channels` = 1,
    * RGB for 3; `value` holds one sample per channel). Solid fills are
    * the shape whose decode error is provably tiny — every 8×8 block is
    * DC-only, so quantization error ≤ quantStep/16 per sample — which is
    * what makes a lossy codec oracle-checkable via a tolerance verdict.
    * Encoder state is per-call; callers batching many images per
    * partition amortize via [[encoderFor]]. */
  def encodeSolid(
      width: Int, height: Int, channels: Int, value: Array[Int],
      quality: Float = 0.95f): Array[Byte] = {
    val enc = encoderFor(quality)
    try enc.encodeSolid(width, height, channels, value)
    finally enc.close()
  }

  /** A reusable JPEG encoder (one `ImageWriter` + write param): create
    * once per partition inside `mapPartitions`, call per row, close in
    * the partition epilogue. */
  final class Encoder private[Jpeg] (quality: Float) {
    private val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    private val param: ImageWriteParam = {
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      p
    }

    def encodeSolid(
        width: Int, height: Int, channels: Int, value: Array[Int]): Array[Byte] = {
      require(width > 0 && height > 0, s"bad dims ${width}x$height")
      require(channels == 1 || channels == 3,
        s"JPEG encode supports gray(1)/RGB(3), got $channels")
      require(value.length == channels,
        s"need one sample per channel, got ${value.length} for $channels")
      val imgType =
        if (channels == 1) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
      val img = new java.awt.image.BufferedImage(width, height, imgType)
      val raster = img.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          var b = 0
          while (b < channels) {
            raster.setSample(x, y, b, value(b) & 0xff)
            b += 1
          }
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new MemoryCacheImageOutputStream(bos)
      try {
        writer.setOutput(ios)
        writer.write(null, new IIOImage(img, null, null), param)
      } finally ios.close()
      bos.toByteArray
    }

    def close(): Unit = writer.dispose()
  }

  def encoderFor(quality: Float = 0.95f): Encoder = new Encoder(quality)
}
