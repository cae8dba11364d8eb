package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batched decode/feature-extract plumbing.
  *
  * The decode tier is REAL for every format the JDK can carry: PNG pixels
  * ([[Png.decode]] — Inflater + scanline unfilter, no image library),
  * JPEG pixels ([[Jpeg.decode]] — javax.imageio with a pre-decode
  * allocation guard), 16-bit PCM WAV ([[wavPcmFrames]] — pure column
  * math), and JPEG/MP4 headers natively (plans.JpegMeta/Mp4Meta). Only
  * formats with no JDK codec at all (H.264 video frames et al.) fall
  * back to [[fallbackFeatures]]; a production decoder drops into the
  * same `Iterator[Media]` batches.
  */
object Multimodal {

  /** One media row: opaque bytes + metadata. */
  final case class Media(id: Long, bytes: Array[Byte], mime: String)

  final case class MediaFeatures(
      id: Long,
      nBytes: Long,
      contentHash: String,
      features: Array[Float])

  /** Lift a text/binary column into Media form (binary payload + mime). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String, mime: String)(
      implicit spark: SparkSession): Dataset[Media] = {
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("id"),
      col(payloadCol).cast("binary").as("bytes"),
      lit(mime).as("mime")).as[Media]
  }

  /** Non-image fallback: deterministic 8-dim feature vector from byte
    * content. PNG payloads take the REAL pixel path ([[Png.decode]]) in
    * [[extractFeatures]]; this fold stands in only for formats this
    * container has no codec for. */
  def fallbackFeatures(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      out(i % 8) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Batched feature extraction over partitions — the `mapPartitions` shape
    * a real decoder needs (amortizes model/codec init per partition, not
    * per row). PNG and JPEG payloads DECODE FOR REAL ([[Png.decode]]:
    * Inflater + scanline unfilter; [[Jpeg.decode]]: javax.imageio) and
    * featurize from pixel values (per-channel means, normalized); only
    * formats with no JDK codec fall back to the byte fold. */
  def extractFeatures(media: Dataset[Media])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens here (decoder handle, model session, …)
      rows.map { m =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hash = md.digest(m.bytes).map("%02x".format(_)).mkString
        val feats = Png.decode(m.bytes).orElse(Jpeg.decode(m.bytes)) match {
          case Some(img) =>
            // real pixel features: per-channel mean + global min/max/size
            val out = new Array[Float](8)
            val sums = new Array[Long](4)
            val n = img.pixels.length
            var i = 0; var mn = 255; var mx = 0
            while (i < n) {
              val v = img.pixels(i)
              sums(i % img.channels) += v
              if (v < mn) mn = v; if (v > mx) mx = v
              i += 1
            }
            val perChan = n / img.channels
            var c = 0
            while (c < img.channels) {
              out(c) = (sums(c).toDouble / perChan / 255.0).toFloat; c += 1
            }
            out(4) = mn / 255.0f; out(5) = mx / 255.0f
            out(6) = img.width.toFloat; out(7) = img.height.toFloat
            out
          case None => fallbackFeatures(m.bytes)
        }
        MediaFeatures(m.id, m.bytes.length.toLong, hash, feats)
      }
    }
  }

  /** One decoded-pixel stats row per image. Exact integers only
    * (sums/min/max as longs) so the result is hash-stable across engines;
    * decode failures surface as width = -1 rather than silent drops. */
  final case class PngStats(
      id: Long, width: Long, height: Long, channels: Long,
      px_sum: Long, px_min: Long, px_max: Long, ch0_sum: Long)

  /** REAL image decode tier — the PNG sibling of [[wavPcmFrames]]: every
    * payload runs the full Inflater + unfilter pipeline ([[Png.decode]])
    * and reduces to exact per-image pixel statistics. `mapPartitions`
    * batch shape: decode parallelism is the scan's, transient memory is
    * one image's recon buffer (bounded by [[Png.maxPixels]]). */
  def pngPixelStats(df: DataFrame, idCol: String, binCol: String)(
      implicit spark: SparkSession): Dataset[PngStats] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(binCol).cast("binary").as("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          Png.decode(bytes) match {
            case Some(img) =>
              var sum = 0L; var ch0 = 0L
              var mn = 255L; var mx = 0L
              var i = 0
              while (i < img.pixels.length) {
                val v = img.pixels(i).toLong
                sum += v
                if (i % img.channels == 0) ch0 += v
                if (v < mn) mn = v; if (v > mx) mx = v
                i += 1
              }
              PngStats(id, img.width.toLong, img.height.toLong,
                img.channels.toLong, sum, mn, mx, ch0)
            case None => PngStats(id, -1L, -1L, -1L, -1L, -1L, -1L, -1L)
          }
        }
      }
  }

  /** One decoded-JPEG stats row per image — the lossy sibling of
    * [[PngStats]]. Same exact-integer reduction (the DECODED samples are
    * definite bytes; only their relation to the pre-encode source is
    * approximate), same loud width = -1 failure lane. */
  final case class JpegStats(
      id: Long, width: Long, height: Long, channels: Long,
      px_sum: Long, px_min: Long, px_max: Long, ch0_sum: Long)

  /** REAL JPEG pixel decode tier — [[pngPixelStats]] for JPEG payloads:
    * every payload runs the full javax.imageio decode ([[Jpeg.decode]] —
    * header-probed allocation guard, R,G,B band order) and reduces to
    * per-image pixel statistics. `mapPartitions` batch shape: decode
    * parallelism is the scan's, transient memory one image bounded by
    * [[Png.maxPixels]]. Because JPEG is lossy, downstream oracles check
    * dimensions exactly and values via tolerance verdicts
    * (CodecQueries.qJpegPixels), never raw samples. */
  def jpegPixelStats(df: DataFrame, idCol: String, binCol: String)(
      implicit spark: SparkSession): Dataset[JpegStats] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(binCol).cast("binary").as("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // one reader per partition, not per image: the ImageIO service
        // lookup + reader work buffers dominate small-image decode cost
        val dec = Jpeg.decoder()
        val tc = Option(org.apache.spark.TaskContext.get())
        tc.foreach(_.addTaskCompletionListener[Unit](_ => dec.close()))
        val mapped = rows.map { case (id, bytes) =>
          dec.decode(bytes) match {
            case Some(img) =>
              var sum = 0L; var ch0 = 0L
              var mn = 255L; var mx = 0L
              var i = 0
              while (i < img.pixels.length) {
                val v = img.pixels(i).toLong
                sum += v
                if (i % img.channels == 0) ch0 += v
                if (v < mn) mn = v; if (v > mx) mx = v
                i += 1
              }
              JpegStats(id, img.width.toLong, img.height.toLong,
                img.channels.toLong, sum, mn, mx, ch0)
            case None => JpegStats(id, -1L, -1L, -1L, -1L, -1L, -1L, -1L)
          }
        }
        // no TaskContext (driver-local iteration, e.g. toLocalIterator in
        // a test): self-closing wrapper — closes the per-partition reader
        // on full exhaustion, on an exception mid-iteration, AND via the
        // caller-invocable Closeable for early stops (take/head): a
        // driver-local caller that abandons mid-stream calls close()
        // instead of draining.
        if (tc.isDefined) mapped
        else new SelfClosingIterator(mapped, () => dec.close())
      }
  }

  /** Driver-local decode iterator wrapper: releases the wrapped resource
    * on exhaustion (final hasNext == false), on any exception thrown
    * mid-iteration, or explicitly via [[java.io.Closeable]] when a caller
    * stops early (take/head) — whichever comes first; close is
    * idempotent. */
  final class SelfClosingIterator[A](
      underlying: Iterator[A], onClose: () => Unit)
      extends Iterator[A] with java.io.Closeable {
    private var closed = false
    override def close(): Unit = if (!closed) { closed = true; onClose() }
    def hasNext: Boolean = {
      val h =
        try underlying.hasNext
        catch { case e: Throwable => close(); throw e }
      if (!h) close()
      h
    }
    def next(): A =
      try underlying.next()
      catch { case e: Throwable => close(); throw e }
  }

  /** Real metadata decode from PNG bytes — no image library needed: the
    * IHDR chunk is at a fixed offset, width/height are big-endian int32 at
    * bytes 16-19 / 20-23. Pure expressions (hex slice → base-16 parse), so
    * header introspection of billions of images runs inside the scan. */
  def pngDims(bin: org.apache.spark.sql.Column): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    def beInt(off: Int) = conv(hex(substring(bin, off, 4)), 16, 10).cast("long")
    (beInt(17), beInt(21))
  }

  /** PNG signature check (first 8 bytes). */
  def isPng(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    hex(substring(bin, 1, 8)) === "89504E470D0A1A0A"

  /** Real metadata decode from canonical WAV (RIFF/PCM) bytes — like
    * [[pngDims]], no audio library: for the standard layout ("RIFF" +
    * size + "WAVE" + "fmt " chunk at offset 12), channels are LE-uint16 at
    * bytes 23-24, sample rate LE-uint32 at 25-28, bits/sample LE-uint16 at
    * 35-36. Little-endian parse = byte-reversed hex → base-16. Pure
    * expressions, so audio-header introspection runs inside the scan. */
  def wavMeta(bin: org.apache.spark.sql.Column):
      (org.apache.spark.sql.Column, org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    def leInt(off: Int, n: Int) = {
      val bytesRev = (0 until n).reverse.map(i => hex(substring(bin, off + i, 1)))
      conv(concat(bytesRev: _*), 16, 10).cast("long")
    }
    (leInt(23, 2), leInt(25, 4), leInt(35, 2))
  }

  /** RIFF/WAVE signature check (bytes 1-4 and 9-12). */
  def isWav(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    hex(substring(bin, 1, 4)) === "52494646" &&
      hex(substring(bin, 9, 4)) === "57415645"

  /** Real metadata decode from JPEG bytes: width/height/progressive from
    * the SOF segment. Unlike PNG/WAV the offset is variable (the parser
    * walks the marker-length segment chain), so this is a native one-pass
    * expression (graft.plans.JpegMeta) rather than substring arithmetic.
    * Null for non-JPEG or truncated streams. */
  def jpegMeta(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.plans.MediaNative.jpegMeta(bin)

  /** JPEG SOI signature check (first 2 bytes). */
  def isJpeg(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    hex(substring(bin, 1, 2)) === "FFD8"

  /** MP4/ISO-BMFF movie metadata: timescale/duration/version from the
    * mvhd box, found by walking the variable-size box chain into moov
    * (graft.plans.Mp4Meta — largesize and to-EOF boxes handled, null on
    * malformed input). The video-container sibling of [[jpegMeta]]. */
  def mp4Meta(bin: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.plans.MediaNative.mp4Meta(bin)

  /** REAL audio decode — not a stub: canonical 16-bit PCM WAV bytes →
    * per-frame waveform statistics, entirely in column math (substring +
    * hex + conv + higher-order array functions; zero UDFs, zero audio
    * libraries). The audio sibling of [[jpegMeta]]'s "parse the actual
    * bytes" discipline:
    *
    *   - header fields come from [[wavMeta]] (channels / sample rate /
    *     bits per sample at their fixed canonical offsets);
    *   - the data chunk (bytes 45+, size = LE-uint32 at 41-44) is cut
    *     into frames of `frameSamples` samples;
    *   - each 16-bit little-endian sample is sign-decoded
    *     (u ≥ 2^15 → u − 2^16) and each frame reduces to
    *     n_samples / peak (max |s|) / rms (√(Σs²/n)).
    *
    * Scale shape: one projection + one explode — frames of one payload
    * never leave their partition, so decode parallelism is the scan's.
    * The per-sample substring arithmetic costs ~6 expression nodes per
    * sample; a production path would fuse them into one native
    * expression exactly like plans.JpegMeta fuses the segment walk, with
    * this column form as its differential oracle. */
  def wavPcmFrames(
      df: DataFrame, idCol: String, binCol: String, frameSamples: Int): DataFrame = {
    require(frameSamples >= 1, s"frameSamples must be >= 1, got $frameSamples")
    val bin = col(binCol).cast("binary")
    def leLong(off: Int, n: Int) = {
      val bytesRev = (0 until n).reverse.map(i => hex(substring(bin, off + i, 1)))
      conv(concat(bytesRev: _*), 16, 10).cast("long")
    }
    val (chans, rate, bits) = wavMeta(bin)
    // `/` on columns is TRUE division (double); the sample count must be
    // integral for the sequence bounds below
    val nSamples = (leLong(41, 4) / (bits / 8) / chans).cast("long")
    val base = df.select(
      col(idCol), bin.as("__b"), rate.as("sample_rate"), nSamples.as("__n"),
      explode(sequence(lit(0L),
        ceil(nSamples.cast("double") / frameSamples).cast("long") - 1)).as("frame_id"))
    // frame sample values: 16-bit LE at data offset 45 + 2j (1-based),
    // sign-corrected — the array is materialized once per frame row and
    // feeds all three stats
    val vals = transform(
      sequence(col("frame_id") * frameSamples,
        least((col("frame_id") + 1) * frameSamples, col("__n")) - 1),
      j => {
        val u = conv(concat(
          hex(col("__b").substr(lit(46) + j * 2, lit(1))),
          hex(col("__b").substr(lit(45) + j * 2, lit(1)))), 16, 10).cast("long")
        when(u >= 32768L, u - 65536L).otherwise(u)
      })
    base
      .withColumn("__v", vals)
      .select(
        col(idCol), col("sample_rate"), col("frame_id"),
        size(col("__v")).cast("long").as("n_samples"),
        array_max(transform(col("__v"), v => abs(v))).as("peak"),
        sqrt(aggregate(col("__v"), lit(0.0),
          (acc, v) => acc + v.cast("double") * v.cast("double"))
          / size(col("__v"))).as("rms"))
  }

  /** Frame/chunk sampling: split a binary payload into fixed-size chunks
    * (video frame / audio window stand-in), exploded one row per chunk —
    * pure expressions, no UDF. */
  def chunk(df: DataFrame, payloadCol: String, chunkBytes: Int): DataFrame = {
    val bin = col(payloadCol).cast("binary")
    val n = ceil(octet_length(bin).cast("double") / chunkBytes).cast("int")
    df.withColumn("chunk_id", explode(sequence(lit(0), greatest(n, lit(1)) - 1, lit(1))))
      .withColumn("chunk",
        bin.substr(col("chunk_id") * chunkBytes + 1, lit(chunkBytes)))
      .withColumn("chunk_bytes", octet_length(col("chunk")))
  }
}
