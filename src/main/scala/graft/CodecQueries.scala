package graft

import graft.functions.Codecs._
import graft.multimodal.{Multimodal, Png}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import Queries.Q

/** Queries exercising the codec nodes (§2.2) and source/sink/multimodal
  * plumbing (§2.3, part of §2.6). */
object CodecQueries {

  /** JsonToPython: typed from_json + single-path extraction. */
  val qJsonParse = Q(
    "q_json_parse",
    (s, dir) => {
      val schema = StructType(Seq(StructField("k", IntegerType)))
      Tables(s, dir).events.select(
        col("event_id"),
        jsonParse(col("props"), schema).getField("k").as("k_typed"),
        jsonGet(col("props"), "$.k").as("k_str"))
    },
    Some("""SELECT event_id,
              CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
              json_extract_string(props, '$.k') AS k_str
            FROM events"""))

  /** PythonToJson: serialize columns to a JSON payload. */
  val qJsonFormat = Q(
    "q_json_format",
    (s, dir) => {
      Tables(s, dir).events.select(
        col("event_id"),
        jsonFormat(col("event_id"), col("event_type"), col("user_id")).as("payload"))
    },
    Some("""SELECT event_id, to_json(struct_pack(
              event_id := event_id, event_type := event_type,
              user_id := user_id))::VARCHAR AS payload
            FROM events"""))

  /** Encode/Decode charset roundtrip + byte length of encoded payload. */
  val qEncodeDecode = Q(
    "q_encode_decode",
    (s, dir) => {
      val c = Tables(s, dir).customer
      c.select(
        col("c_custkey"),
        decodeText(encodeText(col("c_name"))).as("name_rt"),
        octet_length(encodeText(col("c_name"))).cast("long").as("n_bytes"))
    },
    Some("""SELECT c_custkey, c_name AS name_rt,
              octet_length(encode(c_name)) AS n_bytes FROM customer"""))

  /** B64Encode/B64Decode roundtrip. */
  val qB64Roundtrip = Q(
    "q_b64_roundtrip",
    (s, dir) => {
      val c = Tables(s, dir).customer
      val b64 = b64Encode(encodeText(col("c_name")))
      c.select(
        col("c_custkey"),
        b64.as("b64"),
        decodeText(b64Decode(b64)).as("back"))
    },
    Some("""SELECT c_custkey, base64(encode(c_name)) AS b64, c_name AS back
            FROM customer"""))

  /** Python2CSVstr: one CSV line per message. */
  val qCsvFormat = Q(
    "q_csv_format",
    (s, dir) => {
      Tables(s, dir).customer.select(
        col("c_custkey"),
        csvFormat(";", col("c_custkey"), col("c_name"), col("c_mktsegment"),
          round(col("c_acctbal"), 2)).as("line"))
    },
    Some("""SELECT c_custkey, concat_ws(';', c_custkey, c_name, c_mktsegment,
              round(c_acctbal, 2)) AS line FROM customer"""))

  /** CSVstr2Python: parse the line back, pick fields (typed + untyped). */
  val qCsvParse = Q(
    "q_csv_parse",
    (s, dir) => {
      val line = csvFormat(";", col("c_custkey"), col("c_name"), col("c_mktsegment"))
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType),
        StructField("segment", StringType)))
      Tables(s, dir).customer.select(
        col("c_custkey"),
        element_at(csvSplit(line, ";"), 2).as("f_name"),
        csvParse(line, schema, ";").getField("segment").as("f_segment"))
    },
    Some("""SELECT c_custkey,
              string_split(concat_ws(';', c_custkey, c_name, c_mktsegment), ';')[2] AS f_name,
              string_split(concat_ws(';', c_custkey, c_name, c_mktsegment), ';')[3] AS f_segment
            FROM customer"""))

  /** PythonToXML: element building. */
  val qXmlFormat = Q(
    "q_xml_format",
    (s, dir) => {
      Tables(s, dir).customer.select(
        col("c_custkey"),
        xmlFormat("cust",
          "name" -> col("c_name"),
          "seg" -> col("c_mktsegment"),
          "key" -> col("c_custkey")).as("xml"))
    },
    Some("""SELECT c_custkey,
              concat('<cust>', '<name>', c_name, '</name>', '<seg>', c_mktsegment,
                '</seg>', '<key>', c_custkey, '</key>', '</cust>') AS xml
            FROM customer"""))

  /** XMLToPython: XPath extraction from an XML payload. */
  val qXmlParse = Q(
    "q_xml_parse",
    (s, dir) => {
      val xml = xmlFormat("cust", "name" -> col("c_name"), "seg" -> col("c_mktsegment"))
      Tables(s, dir).customer.select(
        col("c_custkey"),
        xmlExtract(xml, "/cust/name").as("name"),
        xmlExtract(xml, "/cust/seg").as("seg"))
    },
    Some("""SELECT c_custkey, c_name AS name, c_mktsegment AS seg FROM customer"""))

  /** PythonToHL7 / HL7ToPython: segment+field construction and access. */
  val qHl7Parse = Q(
    "q_hl7_parse",
    (s, dir) => {
      val msg = hl7Format(Seq(
        Seq(lit("MSH"), lit("^~&"), lit("GRAFT"), col("c_mktsegment")),
        Seq(lit("PID"), col("c_custkey"), col("c_name"))))
      Tables(s, dir).customer.select(
        col("c_custkey"),
        msg.as("hl7"),
        hl7Field(msg, 1, 2).as("pid_name"),
        hl7Field(msg, 0, 3).as("msh_app"))
    },
    Some("""SELECT c_custkey,
              concat('MSH|^~&|GRAFT|', c_mktsegment, chr(13),
                     'PID|', c_custkey, '|', c_name) AS hl7,
              c_name AS pid_name,
              c_mktsegment AS msh_app
            FROM customer"""))

  /** Email node: RFC-822 text rendering. */
  val qEmailFormat = Q(
    "q_email_format",
    (s, dir) => {
      Tables(s, dir).customer.select(
        col("c_custkey"),
        emailFormat(
          subject = concat(lit("Account "), col("c_custkey")),
          sender = lit("graft@example.com"),
          recipients = lower(col("c_name")),
          body = concat(lit("Balance update for "), col("c_name"))).as("mime"))
    },
    Some("""SELECT c_custkey,
              concat('Subject: Account ', c_custkey, chr(13), chr(10),
                     'From: graft@example.com', chr(13), chr(10),
                     'To: ', lower(c_name), chr(13), chr(10), chr(13), chr(10),
                     'Balance update for ', c_name) AS mime
            FROM customer"""))

  /** HttpRequest: URL + query-string building with URL encoding. */
  val qHttpUrl = Q(
    "q_http_url",
    (s, dir) => {
      Tables(s, dir).orders.select(
        col("o_orderkey"),
        httpUrl("https://api.example.com/orders",
          "id" -> col("o_orderkey"),
          "status" -> col("o_orderstatus"),
          "priority" -> col("o_orderpriority")).as("url"))
    },
    Some("""SELECT o_orderkey,
              concat('https://api.example.com/orders?id=', o_orderkey,
                '&status=', o_orderstatus, '&priority=',
                replace(o_orderpriority, ' ', '+')) AS url
            FROM orders"""))

  /** FileReader/FileWriter: write a CSV extract, read it back typed. */
  val qSourceRoundtrip = Q(
    "q_source_roundtrip",
    (s, dir) => {
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_src_rt_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      Tables(s, dir).customer
        .filter(col("c_custkey") <= 50)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .write.mode("overwrite").option("header", "true").csv(tmp)
      s.read
        .schema(StructType(Seq(
          StructField("c_custkey", LongType),
          StructField("c_name", StringType),
          StructField("c_acctbal", DoubleType))))
        .option("header", "true")
        .csv(tmp)
    },
    Some("""SELECT c_custkey, c_name, c_acctbal FROM customer
            WHERE c_custkey <= 50"""))

  /** Multimodal: opaque binary payload + typed metadata extraction +
    * chunk/frame counting — the columnar plumbing for image/audio work
    * (real pixel/sample decodes live in q_png_pixels / q_jpeg_pixels /
    * q_wav_frames; see graft.multimodal). */
  val qMultimodalMeta = Q(
    "q_multimodal_meta",
    (s, dir) => {
      val bin = encode(col("text"), "UTF-8")
      Tables(s, dir).documents.select(
        col("doc_id"),
        octet_length(bin).cast("long").as("n_bytes"),
        md5(bin).as("content_hash"),
        pmod(octet_length(bin), lit(640)).cast("long").as("fake_width"),
        pmod(octet_length(bin), lit(480)).cast("long").as("fake_height"),
        ceil(octet_length(bin).cast("double") / 256.0).cast("long").as("n_chunks"))
    },
    Some("""SELECT doc_id, octet_length(encode(text)) AS n_bytes,
              md5(text) AS content_hash,
              octet_length(encode(text)) % 640 AS fake_width,
              octet_length(encode(text)) % 480 AS fake_height,
              CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_chunks
            FROM documents"""))

  /** JPEG header decode: per-row JPEG streams are SYNTHESIZED from doc_id
    * (variable-length COM segment, SOF0/SOF2 mix, dimensions a closed
    * function of the id), then parsed back by the real segment-walking
    * expression (graft.plans.JpegMeta). The oracle states the closed form —
    * a mismatch means the parser mis-walked the chain. */
  val qJpegMeta = Q(
    "q_jpeg_meta",
    (s, dir) => {
      val id = col("doc_id")
      val h = pmod(id, lit(2000)) + 1
      val w = pmod(id * 7, lit(3000)) + 1
      val nPad = pmod(id, lit(10)) // variable COM payload length, 0..9
      val com = concat(lit("FFFE"), lpad(hex(nPad + 2), 4, "0"),
        lit("AB" * 10).substr(lit(1), nPad * 2))
      val sof = when(pmod(id, lit(3)) === 0, lit("FFC2")).otherwise(lit("FFC0"))
      val bytes = unhex(concat(
        lit("FFD8"), com,
        sof, lit("001108"), lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"),
        lit("03011100021101031101")))
      val meta = Multimodal.jpegMeta(bytes)
      Tables(s, dir).documents.select(
        id.as("doc_id"),
        meta.getField("width").as("width"),
        meta.getField("height").as("height"),
        meta.getField("progressive").as("progressive"))
    },
    Some("""SELECT doc_id,
              (doc_id * 7) % 3000 + 1 AS width,
              doc_id % 2000 + 1 AS height,
              doc_id % 3 = 0 AS progressive
            FROM documents"""))

  /** MP4 movie-header decode: per-row ISO-BMFF streams SYNTHESIZED from
    * doc_id — an `ftyp`, a variable-length `free` box that switches to
    * the 64-bit largesize encoding every 5th id, then `moov`/`mvhd` in
    * version 0 or 1 by id parity, timescale/duration closed functions of
    * the id. Parsed back by the real box-walking expression
    * (graft.plans.Mp4Meta); the oracle states the closed form, so a
    * mismatch means the walker mis-stepped the chain. */
  val qMp4Meta = Q(
    "q_mp4_meta",
    (s, dir) => {
      val id = col("doc_id")
      val ts = pmod(id, lit(48000)) + 600
      val dur = pmod(id * 37, lit(1000000)) + 100
      val nPad = pmod(id, lit(7)) // 0..6 bytes of free-box payload
      val pad = lit("00" * 6).substr(lit(1), nPad * 2)
      val free = when(pmod(id, lit(5)) === 0,
          // largesize form: size=1, fourcc, 64-bit size = 16 + pad
          concat(lit("00000001"), lit("66726565"),
            lpad(hex(nPad + 16), 16, "0"), pad))
        .otherwise(
          concat(lpad(hex(nPad + 8), 8, "0"), lit("66726565"), pad))
      val zeros80 = lit("00" * 80)
      val mvhd = when(pmod(id, lit(2)) === 0,
          // version 0: 32-bit times, box size 108
          concat(lit("0000006C"), lit("6D766864"), lit("00000000"),
            lit("00000000"), lit("00000000"),
            lpad(hex(ts), 8, "0"), lpad(hex(dur), 8, "0"), zeros80))
        .otherwise(
          // version 1: 64-bit times, box size 120
          concat(lit("00000078"), lit("6D766864"), lit("01000000"),
            lit("00" * 16),
            lpad(hex(ts), 8, "0"), lpad(hex(dur), 16, "0"), zeros80))
      val moovSize = when(pmod(id, lit(2)) === 0, lit("00000074"))
        .otherwise(lit("00000080"))
      val bytes = unhex(concat(
        lit("00000010"), lit("66747970"), lit("69736F6D"), lit("00000200"),
        free,
        moovSize, lit("6D6F6F76"), mvhd))
      val meta = graft.multimodal.Multimodal.mp4Meta(bytes)
      Tables(s, dir).documents.select(
        id.as("doc_id"),
        meta.getField("timescale").as("timescale"),
        meta.getField("duration").as("duration"),
        meta.getField("version").as("version"))
    },
    Some("""SELECT doc_id,
              doc_id % 48000 + 600 AS timescale,
              (doc_id * 37) % 1000000 + 100 AS duration,
              CAST(doc_id % 2 = 1 AS INT) AS version
            FROM documents"""))

  /** WAV PCM decode + frame sampling: canonical 16-bit mono WAV streams
    * are SYNTHESIZED from doc_id (sample rate and length closed functions
    * of the id, sample j = (doc_id·31 + j·17) mod 2^16 sign-decoded),
    * then decoded BACK from the actual bytes by
    * [[graft.multimodal.Multimodal.wavPcmFrames]] — header fields from
    * their fixed offsets, every 16-bit LE sample from the data chunk —
    * and reduced to per-frame n_samples/peak/rms. The oracle states the
    * closed form directly (no byte parsing), so a mismatch means the
    * decoder mis-read real bytes. rms carries the repo's fl4
    * output-position quantization (sqrt). */
  val qWavFrames = Q(
    "q_wav_frames",
    (s, dir) => {
      val id = col("doc_id")
      val n = pmod(id, lit(57)) + 40 // 40..96 samples → 3..6 frames of 16
      val rate = pmod(id, lit(8)) * 1000 + 8000
      def le(v: org.apache.spark.sql.Column, bytes: Int) = {
        val b = lpad(hex(v), bytes * 2, "0")
        concat((0 until bytes).map(i =>
          b.substr(lit(bytes * 2 - 2 * i - 1), lit(2))): _*)
      }
      val dataBytes = n * 2
      val header = concat(
        lit("52494646"), le(dataBytes + 36, 4), lit("57415645"), // RIFF size WAVE
        lit("666D7420"), le(lit(16), 4), // "fmt " + chunk size
        le(lit(1), 2), le(lit(1), 2), // PCM, mono
        le(rate, 4), le(rate * 2, 4), // sample rate, byte rate
        le(lit(2), 2), le(lit(16), 2), // block align, bits/sample
        lit("64617461"), le(dataBytes, 4)) // "data" + size
      val samplesHex = array_join(transform(
        sequence(lit(0L), n - 1),
        j => le(pmod(id * 31 + j * 17, lit(65536L)), 2)), "")
      val wav = unhex(concat(header, samplesHex))
      Multimodal.wavPcmFrames(
          Tables(s, dir).documents.select(id.as("doc_id"), wav.as("wav")),
          "doc_id", "wav", frameSamples = 16)
        .select(col("doc_id"), col("sample_rate"), col("frame_id"),
          col("n_samples"), col("peak"),
          (floor(col("rms") * 10000 + 0.5) / 10000).as("rms"))
    },
    Some("""WITH d AS MATERIALIZED (
              SELECT doc_id, doc_id % 57 + 40 AS n,
                doc_id % 8 * 1000 + 8000 AS sample_rate
              FROM documents),
            frames AS MATERIALIZED (
              SELECT doc_id, sample_rate, n,
                unnest(range(0, CAST(ceil(n / 16.0) AS BIGINT))) AS frame_id
              FROM d),
            samp AS MATERIALIZED (
              SELECT doc_id, sample_rate, frame_id,
                unnest(range(frame_id * 16, least((frame_id + 1) * 16, n))) AS j
              FROM frames),
            vals AS MATERIALIZED (
              SELECT doc_id, sample_rate, frame_id,
                CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
              FROM (SELECT doc_id, sample_rate, frame_id,
                      (doc_id * 31 + j * 17) % 65536 AS u
                    FROM samp))
            SELECT doc_id, sample_rate, frame_id,
              count(*) AS n_samples,
              max(abs(s)) AS peak,
              floor(sqrt(sum(s * s)::DOUBLE / count(*)) * 10000 + 0.5) / 10000 AS rms
            FROM vals
            GROUP BY doc_id, sample_rate, frame_id"""))

  /** REAL PNG pixel decode: per-row PNG streams are SYNTHESIZED from
    * doc_id (dimensions/channels/filter type all closed functions of the
    * id — every scanline filter 0..4 is exercised across the corpus;
    * pixel p = (id·31 + p·7) mod 256), written as actual deflate-
    * compressed PNGs ([[graft.multimodal.Png.encode]]), then decoded
    * BACK from the real bytes — chunk walk, CRC verify, Inflater,
    * unfilter — by [[graft.multimodal.Multimodal.pngPixelStats]] and
    * reduced to exact-integer per-image pixel stats. The oracle states
    * the pixel closed form directly (no byte parsing), so a mismatch
    * means the decoder mis-reconstructed real pixels. Decode-side
    * independence from the encoder is pinned by PngSpec's hand-built
    * stored-block fixtures. */
  val qPngPixels = Q(
    "q_png_pixels",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir).documents
        .select(col("doc_id").cast("long")).as[Long]
      val pngs = docs.map { id =>
        val w = (id % 6 + 2).toInt; val h = (id % 4 + 2).toInt
        val ch = (id % 3) match { case 0 => 1; case 1 => 3; case _ => 4 }
        val n = w * h * ch
        val px = Array.tabulate(n)(p => ((id * 31 + p * 7) % 256).toInt)
        (id, Png.encode(w, h, ch, (id % 5).toInt, px))
      }.toDF("doc_id", "png")
      Multimodal.pngPixelStats(pngs, "doc_id", "png")(s)
        .toDF().withColumnRenamed("id", "doc_id")
    },
    Some("""WITH base AS (
              SELECT doc_id,
                     doc_id % 6 + 2 AS width,
                     doc_id % 4 + 2 AS height,
                     CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3
                          ELSE 4 END AS BIGINT) AS channels
              FROM documents
            ), px AS (
              SELECT doc_id, width, height, channels,
                     list_transform(range(0, width*height*channels),
                                    p -> (doc_id*31 + p*7) % 256) AS vals
              FROM base)
            SELECT doc_id, width, height, channels,
              CAST(list_sum(vals) AS BIGINT) AS px_sum,
              CAST(list_min(vals) AS BIGINT) AS px_min,
              CAST(list_max(vals) AS BIGINT) AS px_max,
              CAST(list_sum(list_transform(
                list_filter(range(0, width*height*channels),
                            p -> p % channels = 0),
                p -> (doc_id*31 + p*7) % 256)) AS BIGINT) AS ch0_sum
            FROM px"""))

  /** REAL JPEG pixel decode: per-row SOLID-color JPEGs are SYNTHESIZED
    * from doc_id (dims/channels/fill all closed functions of the id),
    * encoded as actual entropy-coded streams ([[graft.multimodal.Jpeg]]
    * over javax.imageio at quality 0.95), then decoded BACK from the real
    * bytes by [[graft.multimodal.Multimodal.jpegPixelStats]]. JPEG is
    * lossy, so unlike q_png_pixels the oracle cannot state raw samples:
    * it states the DIMENSIONS closed form exactly (lossless in JPEG) plus
    * a tolerance VERDICT on values — solid fills are DC-only per 8×8
    * block, so decode error is ≤ quantStep/16 ≈ 1 per sample and a ±8
    * gate has ~8× headroom; `within_tol = false` (or width = -1) on any
    * decode corruption breaks the hash. */
  val qJpegPixels = Q(
    "q_jpeg_pixels",
    (s, dir) => {
      import s.implicits._
      val docs = Tables(s, dir).documents
        .select(col("doc_id").cast("long")).as[Long]
      val jpgs = docs.mapPartitions { ids =>
        val enc = graft.multimodal.Jpeg.encoderFor(0.95f)
        // one native ImageWriter per partition; released deterministically
        // with the task (not left to GC finalization of imageio natives)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => enc.close()))
        ids.map { id =>
          val w = (id % 6 + 8).toInt; val h = (id % 5 + 8).toInt
          val bytes =
            if (id % 2 == 0) enc.encodeSolid(w, h, 1, Array((id % 256).toInt))
            else enc.encodeSolid(w, h, 3, Array((id % 256).toInt,
              (id * 7 % 256).toInt, (id * 13 % 256).toInt))
          (id, bytes)
        }
      }.toDF("doc_id", "jpg")
      val stats = Multimodal.jpegPixelStats(jpgs, "doc_id", "jpg")(s)
        .toDF().withColumnRenamed("id", "doc_id")
      val r = pmod(col("doc_id"), lit(256L))
      val g = pmod(col("doc_id") * 7, lit(256L))
      val b = pmod(col("doc_id") * 13, lit(256L))
      val lo = when(pmod(col("doc_id"), lit(2)) === 0, r).otherwise(least(r, g, b))
      val hi = when(pmod(col("doc_id"), lit(2)) === 0, r).otherwise(greatest(r, g, b))
      stats.select(
        col("doc_id"), col("width"), col("height"), col("channels"),
        (col("px_min") >= lo - 8 && col("px_max") <= hi + 8).as("within_tol"))
    },
    Some("""SELECT doc_id,
              doc_id % 6 + 8 AS width,
              doc_id % 5 + 8 AS height,
              CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS BIGINT)
                AS channels,
              true AS within_tol
            FROM documents"""))

  def all: Seq[Q] = Seq(
    qJsonParse, qJsonFormat, qEncodeDecode, qB64Roundtrip, qCsvFormat,
    qCsvParse, qXmlFormat, qXmlParse, qHl7Parse, qEmailFormat, qHttpUrl,
    qSourceRoundtrip, qMultimodalMeta, qJpegMeta, qMp4Meta, qWavFrames,
    qPngPixels, qJpegPixels)
}
