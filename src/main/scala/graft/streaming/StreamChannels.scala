package graft.streaming

import graft.api.Channel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Streaming sources — graft's watcher channels, on Structured Streaming.
  *
  * `FileWatcherChannel` (reference: pypeman/channels.py:1306) polls a
  * directory and handles each new file; the Spark-native form is the
  * streaming file source, which tracks processed files in checkpointed state
  * (exactly-once, unlike the reference's in-memory mtime map) and scales the
  * listing/ingest across executors. The same `Channel` value used in batch
  * is applied to the stream — graft nodes are engine-agnostic transforms.
  *
  * `CronChannel` (reference: pypeman/contrib/time.py) maps to trigger
  * scheduling: `Trigger.ProcessingTime` for interval ticks,
  * `Trigger.AvailableNow` for catch-up-and-stop runs.
  */
object StreamChannels {

  /** Watch a directory of files as a stream and run the channel on it. */
  def fileWatcher(
      spark: SparkSession,
      dir: String,
      schema: StructType,
      format: String = "parquet",
      channel: Channel = Channel("watch"),
      maxFilesPerTrigger: Int = 100): DataFrame = {
    val src = spark.readStream
      .format(format)
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
    channel.run(src).main
  }

  /** Windowed aggregation with a watermark — the streaming shape of
    * Queries.qStreamWindow. Event time is cast to plain TIMESTAMP first:
    * watermarks reject TIMESTAMP_NTZ (what naive pandas/pyarrow parquet
    * infers to in sessions graft doesn't own), and the cast is a no-op on
    * already-TIMESTAMP input. */
  def windowedCounts(events: DataFrame, window_ : String, watermark: String): DataFrame =
    events
      .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Dedup-at-ingest for streams: drop re-deliveries of the same id within
    * the watermark horizon (`dropDuplicatesWithinWatermark`) — the
    * streaming form of exact dedup with BOUNDED state: an id's fingerprint
    * is held only until the event-time watermark passes `delay`, so state
    * size tracks the lateness bound, not the corpus (a plain
    * `dropDuplicates` on a stream retains every id forever). The batch
    * form remains `dropDuplicates(idCol)` — same contract, no horizon.
    * Event time is cast like [[windowedCounts]] for NTZ robustness. */
  def dedupWithinWatermark(
      events: DataFrame, idCol: String, tsCol: String, delay: String): DataFrame = {
    val cast = events.withColumn(tsCol,
      col(tsCol).cast(org.apache.spark.sql.types.TimestampType))
    if (cast.isStreaming)
      cast.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(idCol)
    else cast.dropDuplicates(idCol)
  }

  /** Start a channel output into an in-memory table (tests / smoke). */
  def startMemorySink(df: DataFrame, name: String, outputMode: String = "append"): StreamingQuery =
    df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Cron-style interval trigger writer. */
  def cronSink(df: DataFrame, intervalMs: Long, path: String, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(intervalMs))
}

/** Long-running watcher channel: wraps a directory source + Channel +
  * parquet sink with checkpointing — the deployable form of pypeman's
  * FileWatcherChannel (channels.py:1306). `interval` mirrors the reference's
  * poll interval; `Trigger.AvailableNow` (interval = 0) gives a
  * catch-up-and-stop run (CronChannel tick semantics, contrib/time.py).
  */
final class FileWatcherChannel(
    spark: SparkSession,
    watchDir: String,
    schema: StructType,
    channel: Channel,
    outDir: String,
    checkpointDir: String,
    format: String = "parquet",
    intervalMs: Long = 1000,
    maxFilesPerTrigger: Int = 100) {

  def start(): StreamingQuery = {
    val transformed = StreamChannels.fileWatcher(
      spark, watchDir, schema, format, channel, maxFilesPerTrigger)
    val trigger =
      if (intervalMs <= 0) Trigger.AvailableNow() else Trigger.ProcessingTime(intervalMs)
    transformed.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
