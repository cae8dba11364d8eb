package graft

import graft.api.{Channel, Node}
import graft.streaming.StreamChannels
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanosAsLong read
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  test("fileWatcher runs a batch Channel on a stream and delivers rows") {
    val dir = Files.createTempDirectory("graft_watch").toString
    // stage a file into the watched dir (what the reference's watcher polls for)
    Tables(spark, sf).events.limit(500).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val ch = Channel("pipeline")
      .add(Node("errorsOnly")(_.filter(col("event_type") === "error")))
    val stream = StreamChannels.fileWatcher(spark, dir, schema, channel = ch)
    assert(stream.isStreaming)
    val q = StreamChannels.startMemorySink(stream, "watch_out")
    q.awaitTermination(60000)
    val got = spark.sql("SELECT count(*) FROM watch_out").as[Long].head()
    val want = spark.read.parquet(dir).filter(col("event_type") === "error").count()
    assert(got == want && got > 0)
  }

  test("windowed aggregation with watermark over streamed events") {
    val dir = Files.createTempDirectory("graft_win").toString
    Tables(spark, sf).events.limit(1000).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    // ts is already a µs timestamp here (Tables.events converted on write)
    val src = spark.readStream.schema(schema).parquet(dir)
    val agg = StreamChannels.windowedCounts(src, "1 hour", "2 hours")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val n = spark.sql("SELECT sum(n) FROM win_out").as[Long].head()
    assert(n == 1000)
  }

  test("FileWatcherChannel end-to-end: watch dir → channel → parquet sink with checkpoint") {
    val base = Files.createTempDirectory("graft_fwc").toString
    Tables(spark, sf).events.limit(300).write.mode("overwrite").parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    val ch = Channel("w").add(Node("clicks")(_.filter(col("event_type") === "click")))
    val fwc = new graft.streaming.FileWatcherChannel(
      spark, s"$base/in", schema, ch, s"$base/out", s"$base/ckpt", intervalMs = 0)
    val q = fwc.start()
    q.awaitTermination(60000)
    val out = spark.read.parquet(s"$base/out")
    val want = spark.read.parquet(s"$base/in").filter(col("event_type") === "click").count()
    assert(out.count() == want && want > 0)
    // restart with same checkpoint: no reprocessing of seen files
    val q2 = fwc.start()
    q2.awaitTermination(60000)
    assert(spark.read.parquet(s"$base/out").count() == want)
  }

  test("channel graph + node lookup + mock replacement") {
    val ch = Channel("g")
      .add(Node("a")(identity), Node("b")(_.limit(1)))
      .dropWhen(col("event_id") < 0)
      .fork("side")(_.add(Node("c")(identity)))
    assert(ch.nodeNames == Seq("a", "b"))
    assert(ch.getNode("b").isDefined)
    assert(ch.graph().contains("fork:side"))
    val mocked = ch.replaceNode("b", Node("b")(identity))
    val n = mocked.runMain(Tables(spark, sf).events.limit(10)).count()
    assert(n == 10) // limit(1) stubbed out
  }

  test("multimodal: batched stub decode via mapPartitions plumbing") {
    implicit val s = spark
    val docs = Tables(spark, sf).documents.limit(50)
    val media = Multimodal.asMedia(docs, "doc_id", "text", "text/plain")
    val feats = Multimodal.extractFeatures(media)
    val r = feats.collect()
    assert(r.length == 50)
    assert(r.forall(_.features.length == 8))
    assert(r.forall(_.contentHash.length == 32))
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(media).collect()
    assert(r.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("streaming exact dedup: dropDuplicates on content hash with watermark") {
    val base = Files.createTempDirectory("graft_sdedup").toString
    val docs = Tables(spark, sf).documents.limit(100)
    // stage the corpus twice → every doc arrives duplicated
    docs.write.mode("overwrite").parquet(s"$base/in")
    docs.withColumn("doc_id", col("doc_id") + 100000)
      .write.mode("append").parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    val src = spark.readStream.schema(schema).parquet(s"$base/in")
      .withColumn("content_hash", md5(col("text")))
      .withColumn("ingest_ts", current_timestamp())
      .withWatermark("ingest_ts", "1 hour")
      .dropDuplicates("content_hash")
    val q = src.writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.sql("SELECT count(*) FROM sdedup_out").as[Long].head() == 100)
  }

  test("stream-static enrichment join keeps streaming plan broadcast-able") {
    val base = Files.createTempDirectory("graft_enrich").toString
    Tables(spark, sf).events.limit(500).write.mode("overwrite").parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    val dim = Tables(spark, sf).events
      .groupBy("user_id").agg(count(lit(1)).as("user_total"))
    val src = spark.readStream.schema(schema).parquet(s"$base/in")
      .join(broadcast(dim), "user_id")
    val q = src.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.sql("SELECT count(*) FROM enrich_out").as[Long].head() == 500)
    assert(spark.sql("SELECT min(user_total) FROM enrich_out").as[Long].head() > 0)
  }

  test("failWhen routing is streaming-safe: fail/reject/main splits run on a stream") {
    // The FAIL path (round 13) is pure predicate routing, so the same
    // Channel value must run unchanged on a streaming frame — the
    // identical-channel-batch-or-stream contract the watcher relies on.
    val base = Files.createTempDirectory("graft_failstream").toString
    Tables(spark, sf).events.limit(1000).write.mode("overwrite").parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    val src = spark.readStream.schema(schema).parquet(s"$base/in")
    val r = Channel("sf")
      .failWhen(col("value") > 90)
      .rejectWhen(col("event_type") === "error")
      .run(src)
    assert(r.main.isStreaming && r.failedMsgs.get.isStreaming)
    Seq(("m", r.main), ("f", r.failedMsgs.get), ("j", r.rejected.get))
      .foreach { case (n, df) =>
        df.writeStream.format("memory").queryName(s"failstream_$n")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination(60000)
      }
    val m = spark.sql("SELECT count(*) FROM failstream_m").as[Long].head()
    val f = spark.sql("SELECT count(*) FROM failstream_f").as[Long].head()
    val j = spark.sql("SELECT count(*) FROM failstream_j").as[Long].head()
    assert(m + f + j == 1000 && f > 0 && j > 0, s"m=$m f=$f j=$j")
    // batch oracle: identical channel, identical split
    val b = Channel("sf").failWhen(col("value") > 90)
      .rejectWhen(col("event_type") === "error")
      .run(spark.read.parquet(s"$base/in"))
    assert(f == b.failedMsgs.get.count() && j == b.rejected.get.count())
  }

  test("stream-stream interval join with watermarks matches the batch join") {
    val base = Files.createTempDirectory("graft_ssjoin").toString
    Tables(spark, sf).events.limit(2000).write.mode("overwrite").parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    def streamSide(t: String, p: String) =
      spark.readStream.schema(schema).parquet(s"$base/in")
        .filter(col("event_type") === t)
        .select(col("user_id").as(s"${p}_uid"), col("ts").as(s"${p}_ts"),
          col("event_id").as(s"${p}_id"))
        .withWatermark(s"${p}_ts", "2 days")
    val cond = expr(
      "c_uid = v_uid AND v_ts >= c_ts AND v_ts <= c_ts + INTERVAL 1 DAY")
    val q = streamSide("click", "c").join(streamSide("view", "v"), cond)
      .writeStream.format("memory").queryName("ssjoin_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // oracle: the same interval join in batch
    val ev = spark.read.parquet(s"$base/in")
    def batchSide(t: String, p: String) = ev.filter(col("event_type") === t)
      .select(col("user_id").as(s"${p}_uid"), col("ts").as(s"${p}_ts"),
        col("event_id").as(s"${p}_id"))
    val expected = batchSide("click", "c").join(batchSide("view", "v"), cond).count()
    val got = spark.sql("SELECT count(*) FROM ssjoin_out").as[Long].head()
    assert(got == expected && expected > 0, s"stream $got vs batch $expected")
  }

  test("dropDuplicatesWithinWatermark dedups late re-arrivals by key") {
    val base = Files.createTempDirectory("graft_wmdedup").toString
    val docs = Tables(spark, sf).documents.limit(50)
    docs.write.mode("overwrite").parquet(s"$base/in")
    docs.write.mode("append").parquet(s"$base/in") // same keys arrive again
    val schema = spark.read.parquet(s"$base/in").schema
    val src = spark.readStream.schema(schema).parquet(s"$base/in")
      .withColumn("ingest_ts", current_timestamp())
      .withWatermark("ingest_ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("doc_id"))
    val q = src.writeStream.format("memory").queryName("wmdedup_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.sql("SELECT count(DISTINCT doc_id) FROM wmdedup_out").as[Long].head() == 50)
    assert(spark.sql("SELECT count(*) FROM wmdedup_out").as[Long].head() == 50)
  }

  test("streaming append into MessageStore with checkpoint") {
    val base = Files.createTempDirectory("graft_sstore").toString
    Tables(spark, sf).events.limit(200)
      .select(col("event_id").cast("string").as("uuid"), col("ts"),
        col("props").as("payload"))
      .write.mode("overwrite").parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema
    val store = new graft.store.MessageStore(spark, s"$base/store")
    val src = spark.readStream.schema(schema).parquet(s"$base/in")
    val q = store.saveStream(src, s"$base/ckpt")
    q.awaitTermination(60000)
    assert(store.total() == 200)
  }

  test("PNG header decode from raw bytes (no image libs)") {
    // craft a minimal PNG header: signature + IHDR with 640x480
    val bytes = Array[Int](
      0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, // signature
      0x00, 0x00, 0x00, 0x0D, 0x49, 0x48, 0x44, 0x52, // len + "IHDR"
      0x00, 0x00, 0x02, 0x80, // width 640
      0x00, 0x00, 0x01, 0xE0, // height 480
      0x08, 0x06, 0x00, 0x00, 0x00).map(_.toByte)
    val df = Seq(Tuple1(bytes)).toDF("bin")
    val (w, h) = Multimodal.pngDims(col("bin"))
    val r = df.select(Multimodal.isPng(col("bin")).as("ok"), w.as("w"), h.as("h")).head()
    assert(r.getBoolean(0))
    assert(r.getLong(1) == 640L && r.getLong(2) == 480L)
  }

  test("WAV header decode from raw bytes (no audio libs)") {
    // canonical PCM WAV header: stereo, 44100 Hz, 16-bit
    val bytes = (Array[Int](
      0x52, 0x49, 0x46, 0x46, 0x24, 0x00, 0x00, 0x00, // "RIFF" + size
      0x57, 0x41, 0x56, 0x45, 0x66, 0x6D, 0x74, 0x20, // "WAVE" + "fmt "
      0x10, 0x00, 0x00, 0x00, 0x01, 0x00,             // fmt size 16, PCM
      0x02, 0x00,                                     // channels = 2 (LE)
      0x44, 0xAC, 0x00, 0x00,                         // 44100 Hz (LE)
      0x10, 0xB1, 0x02, 0x00, 0x04, 0x00,             // byteRate, blockAlign
      0x10, 0x00                                      // bits = 16 (LE)
    )).map(_.toByte)
    val df = Seq(Tuple1(bytes)).toDF("bin")
    val (ch, rate, bits) = Multimodal.wavMeta(col("bin"))
    val r = df.select(Multimodal.isWav(col("bin")).as("ok"),
      ch.as("ch"), rate.as("rate"), bits.as("bits")).head()
    assert(r.getBoolean(0))
    assert(r.getLong(1) == 2L && r.getLong(2) == 44100L && r.getLong(3) == 16L)
  }

  test("WAV PCM frame decode: real 16-bit LE samples, sign-corrected, hand-computed stats") {
    // mono 16-bit 8000 Hz, 5 samples: 0, 1000, -1000, 32767, -32768
    val wav = (Array[Int](
      0x52, 0x49, 0x46, 0x46, 0x2E, 0x00, 0x00, 0x00, // "RIFF" + size 46
      0x57, 0x41, 0x56, 0x45, 0x66, 0x6D, 0x74, 0x20, // "WAVE" + "fmt "
      0x10, 0x00, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, // fmt 16, PCM, mono
      0x40, 0x1F, 0x00, 0x00, 0x80, 0x3E, 0x00, 0x00, // 8000 Hz, byteRate
      0x02, 0x00, 0x10, 0x00,                         // blockAlign, 16-bit
      0x64, 0x61, 0x74, 0x61, 0x0A, 0x00, 0x00, 0x00, // "data" + size 10
      0x00, 0x00, 0xE8, 0x03, 0x18, 0xFC, 0xFF, 0x7F, 0x00, 0x80
    )).map(_.toByte)
    val df = Seq((7L, wav)).toDF("id", "bin")
    val out = Multimodal.wavPcmFrames(df, "id", "bin", frameSamples = 4)
      .orderBy("frame_id")
      .select("sample_rate", "frame_id", "n_samples", "peak", "rms")
      .collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 8000L)
    assert((out(0).getLong(1), out(0).getLong(2), out(0).getLong(3)) == ((0L, 4L, 32767L)))
    // rms of frame 0: sqrt((0 + 1000^2 + 1000^2 + 32767^2)/4)
    assert(math.abs(out(0).getDouble(4) -
      math.sqrt((1000.0 * 1000 * 2 + 32767.0 * 32767) / 4)) < 1e-9)
    // frame 1 is the ragged tail: the single most-negative sample
    assert((out(1).getLong(1), out(1).getLong(2), out(1).getLong(3)) == ((1L, 1L, 32768L)))
    assert(out(1).getDouble(4) == 32768.0)
  }

  test("JPEG header decode walks the segment chain to the SOF (no image libs)") {
    // SOI, APP0 (skipped), COM (skipped, odd length), SOF0 800x600
    val jpeg = Array[Int](
      0xFF, 0xD8, // SOI
      0xFF, 0xE0, 0x00, 0x06, 0x4A, 0x46, 0x49, 0x46, // APP0, len 6
      0xFF, 0xFE, 0x00, 0x05, 0x61, 0x62, 0x63, // COM, len 5
      0xFF, 0xC0, 0x00, 0x11, 0x08,
      0x02, 0x58, // height 600
      0x03, 0x20, // width 800
      0x03, 0x01, 0x11, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01).map(_.toByte)
    val progressive = jpeg.clone(); progressive(18) = 0xC2.toByte // SOF0 → SOF2
    val truncated = jpeg.take(20) // cut inside the SOF segment
    val notJpeg = Array[Byte](0x00, 0x01, 0x02, 0x03)
    val df = Seq(
      (1L, jpeg), (2L, progressive), (3L, truncated), (4L, notJpeg))
      .toDF("id", "bin")
    val out = df.select(col("id"), Multimodal.jpegMeta(col("bin")).as("m"))
      .select(col("id"), col("m.width"), col("m.height"), col("m.progressive"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2), r.getBoolean(3)))))
      .toMap
    assert(out(1L).contains((800L, 600L, false)))
    assert(out(2L).contains((800L, 600L, true)))
    assert(out(3L).isEmpty && out(4L).isEmpty)
  }

  test("MP4 box walk finds mvhd through largesize and to-EOF boxes") {
    def hexBytes(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val ftyp = "0000001066747970" + "69736F6D00000200"
    // mvhd v0: ts=90000 (0x00015F90), dur=30000 (0x00007530)
    val mvhd0 = "0000006C6D766864" + "00000000" + "00000000" + "00000000" +
      "00015F90" + "00007530" + "00" * 80
    val plain = hexBytes(ftyp + "000000746D6F6F76" + mvhd0)
    // free box in 64-bit largesize form before moov
    val large = hexBytes(ftyp +
      "0000000166726565" + "0000000000000014" + "00" * 4 +
      "000000746D6F6F76" + mvhd0)
    // moov with size==0 (runs to EOF)
    val toEof = hexBytes(ftyp + "000000006D6F6F76" + mvhd0)
    // mvhd v1: 64-bit times, ts=600, dur=2^32 + 5 (needs the 64-bit read)
    val mvhd1 = "000000786D766864" + "01000000" + "00" * 16 +
      "00000258" + "0000000100000005" + "00" * 80
    val v1 = hexBytes(ftyp + "000000806D6F6F76" + mvhd1)
    val truncated = plain.take(40)
    val notMp4 = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)
    val df = Seq((1L, plain), (2L, large), (3L, toEof), (4L, v1),
      (5L, truncated), (6L, notMp4)).toDF("id", "bin")
    val out = df.select(col("id"), Multimodal.mp4Meta(col("bin")).as("m"))
      .select(col("id"), col("m.timescale"), col("m.duration"), col("m.version"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2), r.getInt(3)))))
      .toMap
    assert(out(1L).contains((90000L, 30000L, 0)))
    assert(out(2L).contains((90000L, 30000L, 0)), "largesize box mis-stepped")
    assert(out(3L).contains((90000L, 30000L, 0)), "to-EOF moov mis-sized")
    assert(out(4L).contains((600L, 4294967301L, 1)), "v1 64-bit duration")
    assert(out(5L).isEmpty && out(6L).isEmpty)
  }

  test("streaming sessionization holds an open session across micro-batches") {
    import graft.streaming.Sessionize
    // NOTE: MemoryStream lives in a private[sql] runtime package whose path
    // moves between Spark minors (3.x had it one level up). Fine against
    // the pinned 4.1.2 jars; revisit this import on any Spark bump.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Sessionize.Event]
    val sess = Sessionize.sessions(
      Sessionize.withEventTimeWatermark(mem.toDF()), gapMs = 30000)
    val q = sess.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      // batch 1: two events of one open session — nothing may be emitted
      // (a per-batch flush would wrongly emit (1, 10000, 11000) here).
      // Timestamps start above 0 so none is "late" vs the initial watermark.
      mem.addData(Sessionize.Event(1, 10000L, "a"), Sessionize.Event(1, 11000L, "b"))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM sess_out").as[Long].head() == 0)
      // batch 2: a third event still within the gap, plus another user far
      // in the future that advances the watermark past user 1's horizon
      mem.addData(Sessionize.Event(1, 12000L, "c"), Sessionize.Event(2, 500000L, "x"))
      q.processAllAvailable()
      // batch 3: watermark (now 500s) exceeds user 1's last+gap → timeout
      mem.addData(Sessionize.Event(2, 900000L, "y"))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT startMs, endMs, nEvents FROM sess_out WHERE userId = 1")
        .as[(Long, Long, Int)].collect().toSeq
      // exactly ONE session spanning both micro-batches
      assert(got == Seq((10000L, 12000L, 3)), s"got $got")
    } finally q.stop()
  }

  test("MG sketch runs as a streaming aggregate: hot keys across micro-batches") {
    import graft.plans.MgSketch.mgSketch
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    // streaming hot-key detection: the mergeable sketch aggregates
    // incrementally in update mode — state is k counters, not a per-key
    // table, however many distinct keys the stream carries
    val hot = mem.toDF().toDF("key")
      .agg(mgSketch(col("key"), 8).as("cands"))
    val q = hot.writeStream.format("memory").queryName("mg_out")
      .outputMode("complete").start()
    try {
      mem.addData(Seq.fill(50)(7L) ++ (100L to 140L): _*)
      q.processAllAvailable()
      mem.addData(Seq.fill(60)(9L) ++ (200L to 240L): _*)
      q.processAllAvailable()
      val cands = spark.sql("SELECT explode(cands) AS c FROM mg_out")
        .select("c.id", "c.est").as[(Long, Long)].collect().toMap
      // n = 192, k = 8 → every key with count > n/9 ≈ 21 must be present
      assert(cands.contains(7L) && cands.contains(9L),
        s"hot keys lost across micro-batches: $cands")
      assert(cands.size <= 8)
      // estimates undercount by at most n/(k+1)
      assert(cands(7L) <= 50 && cands(7L) >= 50 - 192 / 9)
      assert(cands(9L) <= 60 && cands(9L) >= 60 - 192 / 9)
    } finally q.stop()
  }

  test("native session_window runs UNCHANGED on a stream (watermark + append)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)] // (userId, tsMs)
    val sessions = mem.toDF().toDF("user_id", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), "30 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("start_ms"),
        unix_millis(col("session_window.end")).as("end_ms"), col("n"))
    val q = sessions.writeStream.format("memory").queryName("sw_out")
      .outputMode("append").start()
    try {
      // session spans two micro-batches; emitted once the watermark
      // passes its end
      mem.addData((1L, 10000L), (1L, 20000L))
      q.processAllAvailable()
      mem.addData((1L, 25000L), (2L, 500000L)) // user 2 advances watermark
      q.processAllAvailable()
      mem.addData((2L, 900000L))
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT start_ms, end_ms, n FROM sw_out WHERE user_id = 1")
        .as[(Long, Long, Long)].collect().toSeq
      // one merged session: start 10s, end = last(25s) + 30s gap
      assert(got == Seq((10000L, 55000L, 3L)), s"got $got")
    } finally q.stop()
  }

  test("LSH parameter chooser hits the S-curve midpoint") {
    assert(graft.dedup.Dedup.lshParamsFor(16, 0.7) == ((4, 4))) // midpoint .707
    assert(graft.dedup.Dedup.lshParamsFor(16, 0.9) == ((2, 8))) // midpoint .917
    val (b, r) = graft.dedup.Dedup.lshParamsFor(16, 0.4)
    assert(math.abs(math.pow(1.0 / b, 1.0 / r) - 0.4) < 0.1)
  }

  test("multimodal: chunking explodes payload into bounded chunks") {
    val df = Seq((1L, "a" * 600)).toDF("id", "payload")
    val out = Multimodal.chunk(df, "payload", 256)
    val sizes = out.select("chunk_bytes").as[Int].collect().toSeq
    assert(sizes == Seq(256, 256, 88))
  }

  test("streaming EWMA carries the running value across micro-batches") {
    import graft.ops.Smoothing
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Smoothing.Point]
    val q = Smoothing.ewmaStream(mem.toDS(), alpha = 0.5)
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode("append").start()
    try {
      // batch 1: s=10, then 0.5*20+0.5*10=15
      mem.addData(Smoothing.Point(1L, 100L, 1L, 10.0), Smoothing.Point(1L, 200L, 2L, 20.0))
      q.processAllAvailable()
      // batch 2: recursion must CONTINUE from 15 → 0.5*5+0.5*15=10;
      // a replayed/late event at ts<=200 must be dropped, not re-folded
      mem.addData(Smoothing.Point(1L, 300L, 3L, 5.0), Smoothing.Point(1L, 150L, 9L, 99.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT id, ewma FROM ewma_out ORDER BY id")
        .as[(Long, Double)].collect().toSeq
      assert(got == Seq((1L, 10.0), (2L, 15.0), (3L, 10.0)), s"got $got")
    } finally q.stop()
  }

  test("batch-mode streaming EWMA equals the relational fold exactly") {
    import graft.ops.Smoothing
    val pts = Seq(
      Smoothing.Point(1L, 10L, 100L, 4.0), Smoothing.Point(1L, 20L, 101L, 8.0),
      Smoothing.Point(1L, 30L, 102L, 1.0), Smoothing.Point(2L, 10L, 103L, 7.0))
    val viaState = Smoothing.ewmaStream(pts.toDS(), alpha = 0.25)
      .collect().map(s => (s.key, s.id, s.ewma)).toSeq.sorted
    val viaFold = Smoothing.ewma(
        pts.toDF(), "key", "ts", "id", "x", alpha = 0.25)
      .select("key", "id", "ewma").as[(Long, Long, Double)].collect().toSeq.sorted
    assert(viaState == viaFold)
  }
}
