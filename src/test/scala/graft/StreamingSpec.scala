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

  test("multimodal: chunking explodes payload into bounded chunks") {
    val df = Seq((1L, "a" * 600)).toDF("id", "payload")
    val out = Multimodal.chunk(df, "payload", 256)
    val sizes = out.select("chunk_bytes").as[Int].collect().toSeq
    assert(sizes == Seq(256, 256, 88))
  }
}
