package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import graft.model.Msg

/** Robustness against TIMESTAMP_NTZ event time — the type Spark 4 infers
  * for naive (isAdjustedToUTC=false) parquet timestamps, which is the
  * pandas/pyarrow DEFAULT. Graft-owned sessions disable that inference
  * (GraftSession: `inferTimestampNTZ.enabled=false`), but the library must
  * also survive in sessions it does NOT own, where events arrive as NTZ.
  * These specs build NTZ columns explicitly (no session-conf rescue
  * possible: `to_timestamp_ntz` always yields NTZ) and run the event-time
  * operator shapes over them.
  */
class TimestampNtzSpec extends SparkSpec {

  /** events-shaped frame whose ts is genuinely TIMESTAMP_NTZ. */
  private def ntzEvents: DataFrame = {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 00:00:00.000001", 10L, "click", 1.0),
      (2L, "2024-01-01 00:00:02.500000", 10L, "click", 2.0),
      (3L, "2024-01-01 00:00:01.000000", 10L, "purchase", 3.0),
      (4L, "2024-01-02 12:30:00.000000", 20L, "view", 4.0),
      (5L, "2024-01-02 12:30:05.000000", 20L, "purchase", 5.0)
    ).toDF("event_id", "raw", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp_ntz(col("raw"))).drop("raw")
    assert(df.schema("ts").dataType == TimestampNTZType)
    df
  }

  test("Msg.epochUs/epochMs accept NTZ and TIMESTAMP alike, same values") {
    val ntz = ntzEvents
    val tz = ntz.withColumn("ts", col("ts").cast(TimestampType))
    val a = ntz.select(col("event_id"), Msg.epochUs(col("ts")).as("us"),
      Msg.epochMs(col("ts")).as("ms")).orderBy("event_id").collect()
    val b = tz.select(col("event_id"), Msg.epochUs(col("ts")).as("us"),
      Msg.epochMs(col("ts")).as("ms")).orderBy("event_id").collect()
    assert(a.toSeq == b.toSeq)
    // pinned-UTC session: naive 2024-01-01T00:00:00.000001 is that instant UTC
    assert(a.head.getLong(1) == 1704067200000001L)
    assert(a.head.getLong(2) == 1704067200000L)
  }

  test("q_cdc_snapshot shape runs on NTZ events without session-conf rescue") {
    val ev = ntzEvents.withColumn("us", Msg.epochUs(col("ts")))
    val snap = graft.ops.Cdc.latestSnapshot(ev,
      keyCols = Seq("user_id", "event_type"),
      versionCols = Seq("us", "event_id"),
      payloadCols = Seq("value"))
    val rows = snap.select(col("user_id"), col("event_type"), col("event_id"))
      .orderBy("user_id", "event_type").collect()
    // user 10 click: latest is event 2; user 10 purchase: event 3
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((10L, "click", 2L), (10L, "purchase", 3L),
        (20L, "purchase", 5L), (20L, "view", 4L)))
  }

  test("q_scd2 shape runs on NTZ events without session-conf rescue") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val out = ntzEvents
      .select(col("user_id"), col("event_id"), col("value"), col("ts"))
      .withColumn("valid_from", Msg.epochUs(col("ts")))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("valid_from"),
        coalesce(Msg.epochUs(col("next_ts")), lit(-1L)).as("valid_to"),
        col("next_ts").isNull.as("is_current"))
      .orderBy("user_id", "valid_from").collect()
    val u10 = out.filter(_.getLong(0) == 10L)
    assert(u10.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L)) // ts order
    // each non-final validity closes exactly at the successor's valid_from
    assert(u10(0).getLong(3) == u10(1).getLong(2))
    assert(u10(1).getLong(3) == u10(2).getLong(2))
    assert(u10(2).getLong(3) == -1L && u10(2).getBoolean(4))
  }

  test("Tables.events normalizes naive-parquet ts to TIMESTAMP even when the session infers NTZ") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz").toString
    // write a naive-timestamp events.parquet the way pandas would:
    // force NTZ logical type via an NTZ column
    ntzEvents.select("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    // simulate a session graft doesn't own: NTZ inference ON
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    val loaded =
      try Tables(spark, dir).events
      finally spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    assert(loaded.schema("ts").dataType == TimestampType)
    assert(loaded.select(Msg.epochUs(col("ts")).as("us"))
      .orderBy("us").head().getLong(0) == 1704067200000001L)
  }

  test("Tables.events naive load is zone-independent: a foreign non-UTC session reads the same instants") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ntz_zone").toString
    ntzEvents.select("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    def epochsUnder(zone: String, ntzInference: Boolean): Seq[Long] = {
      spark.conf.set("spark.sql.session.timeZone", zone)
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", ntzInference.toString)
      try Tables(spark, dir).events
        .select(Msg.epochUs(col("ts")).as("us")).orderBy("us")
        .collect().map(_.getLong(0)).toSeq
      finally {
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      }
    }
    val utc = epochsUnder("UTC", ntzInference = false)
    // a session graft does NOT own: non-UTC zone AND NTZ inference on
    val foreign = epochsUnder("America/Los_Angeles", ntzInference = true)
    assert(utc.head == 1704067200000001L)
    assert(foreign == utc, "naive-as-UTC reading must not depend on the session zone")
  }

  test("Tables.orders/lineitem date columns are normalized under NTZ inference too") {
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try {
      val t = Tables(spark, sf)
      assert(t.orders.schema("o_orderdate").dataType == TimestampType)
      assert(t.lineitem.schema("l_shipdate").dataType == TimestampType)
    } finally spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
  }

  test("StreamChannels.windowedCounts accepts NTZ event time (watermark path)") {
    // batch frame exercises the analysis path that rejected NTZ watermarks
    val counts = streaming.StreamChannels
      .windowedCounts(ntzEvents, "1 hour", "10 minutes")
      .select(col("event_type"), col("n"))
      .orderBy("event_type").collect()
    // the two purchases land in different hour windows → one row each
    assert(counts.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("click", 2L), ("purchase", 1L), ("purchase", 1L), ("view", 1L)))
  }
}
