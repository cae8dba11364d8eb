package graft

import graft.model.Msg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** The r7 incident as a PROPERTY: the driver's testdata regeneration
  * changed events.parquet's physical timestamp flavor and silently broke
  * four queries. This matrix pins `Tables.events` + the event-time
  * operator paths against EVERY physical flavor a producer can emit:
  *
  *   - naive µs (pandas/pyarrow default, isAdjustedToUTC=false — read as
  *     NTZ when a foreign session has inference on)
  *   - UTC-adjusted µs (Spark's own default output)
  *   - UTC-adjusted ms (TIMESTAMP_MILLIS producers)
  *   - INT96 (legacy Hive/Impala writers)
  *   - nanos-as-long (TIMESTAMP(NANOS) arriving via
  *     `legacy.parquet.nanosAsLong`, the shape Spark's reader hands graft)
  *
  * × session configs graft does NOT own (NTZ inference ON, non-UTC zone)
  * × the four event-time paths the incident hit: epoch extraction,
  * watermark windows, as-of join, CDC snapshot. If a future regen lands a
  * flavor `Tables` mishandles, the matrix — not the round gate — fails.
  */
class TimestampFlavorMatrixSpec extends SparkSpec {
  import spark.implicits._

  /** Canonical instants (µs since epoch, UTC): the values every flavor
    * must load back to. Event 1 carries a 1 µs fraction on purpose — it
    * proves µs survive every µs-capable flavor (ms floors it, see below). */
  private val rows = Seq(
    (1L, 1704067200000001L, 10L, "click", 1.0),
    (2L, 1704067202500000L, 10L, "click", 2.0),
    (3L, 1704067201000000L, 10L, "purchase", 3.0),
    (4L, 1704153000000000L, 20L, "view", 4.0),
    (5L, 1704153005000000L, 20L, "purchase", 5.0))

  private def canonical: DataFrame =
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .withColumn("props", lit("{}"))

  /** Flavor name → (writer, µs-exact). Writers produce `$dir/events.parquet`
    * with `ts` in that physical flavor. */
  private val flavors: Seq[(String, String => Unit, Boolean)] = Seq(
    ("naive_us", { dir: String =>
      canonical.withColumn("ts", col("ts").cast(TimestampNTZType))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    }, true),
    ("adjusted_us", { dir: String =>
      writeWithOutputType(dir, "TIMESTAMP_MICROS")
    }, true),
    ("adjusted_ms", { dir: String =>
      writeWithOutputType(dir, "TIMESTAMP_MILLIS")
    }, false),
    ("int96", { dir: String =>
      writeWithOutputType(dir, "INT96")
    }, true),
    ("nanos_long", { dir: String =>
      canonical.withColumn("ts", (unix_micros(col("ts")) * 1000).cast("long"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    }, true))

  private def writeWithOutputType(dir: String, outputType: String): Unit = {
    val key = "spark.sql.parquet.outputTimestampType"
    val prev = spark.conf.get(key)
    spark.conf.set(key, outputType)
    try canonical.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    finally spark.conf.set(key, prev)
  }

  private def flavorDir(name: String, write: String => Unit): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_flavor_$name").toString
    write(dir)
    dir
  }

  private def epochsUnder(dir: String, zone: String, ntzInference: Boolean): Seq[Long] = {
    spark.conf.set("spark.sql.session.timeZone", zone)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", ntzInference.toString)
    try {
      val ev = Tables(spark, dir).events
      assert(ev.schema("ts").dataType == TimestampType,
        s"ts must normalize to TIMESTAMP, got ${ev.schema("ts").dataType}")
      ev.select(Msg.epochUs(col("ts")).as("us"), col("event_id"))
        .orderBy("event_id").collect().map(_.getLong(0)).toSeq
    } finally {
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    }
  }

  test("every physical flavor loads to the same instants under owned AND foreign sessions") {
    for ((name, write, usExact) <- flavors) {
      val dir = flavorDir(name, write)
      val expected =
        if (usExact) rows.map(_._2)
        else rows.map(r => r._2 / 1000 * 1000) // ms flavor floors the µs
      val owned = epochsUnder(dir, "UTC", ntzInference = false)
      assert(owned == expected, s"flavor $name under the graft-owned session")
      // a session graft does NOT own: NTZ inference on, non-UTC zone
      val foreign = epochsUnder(dir, "America/Los_Angeles", ntzInference = true)
      assert(foreign == expected, s"flavor $name under a foreign session")
      // and the mixed case the r7 incident actually hit: inference on, UTC
      assert(epochsUnder(dir, "UTC", ntzInference = true) == expected,
        s"flavor $name with NTZ inference on")
    }
  }

  test("watermark, as-of and CDC paths agree across all µs-exact flavors") {
    def shapes(ev: DataFrame): (Seq[(String, Long)], Seq[(Long, Long)], Seq[(Long, String, Long)]) = {
      val windowed = streaming.StreamChannels
        .windowedCounts(ev, "1 hour", "10 minutes")
        .select(col("event_type"), col("n"))
        .orderBy("event_type", "n")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      // as-of: each event picks the latest prior-or-equal purchase of its user
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val asof = graft.plans.AsOf
        .joinBackward(ev.select(col("user_id"), col("ts"), col("event_id")),
          purchases, "user_id", "ts", "ts", "event_id")
        .select(col("event_id"), coalesce(col("event_id_r"), lit(-1L)).as("matched"))
        .orderBy("event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val snap = graft.ops.Cdc.latestSnapshot(
        ev.withColumn("us", Msg.epochUs(col("ts"))),
        keyCols = Seq("user_id", "event_type"),
        versionCols = Seq("us", "event_id"),
        payloadCols = Seq("value"))
        .select(col("user_id"), col("event_type"), col("event_id"))
        .orderBy("user_id", "event_type")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      (windowed, asof, snap)
    }
    val expected = shapes(canonical)
    // sanity: the canonical shapes themselves, pinned
    assert(expected._3 == Seq((10L, "click", 2L), (10L, "purchase", 3L),
      (20L, "purchase", 5L), (20L, "view", 4L)))
    for ((name, write, usExact) <- flavors if usExact) {
      val dir = flavorDir(name, write)
      assert(shapes(Tables(spark, dir).events) == expected,
        s"operator shapes must be flavor-independent, flavor $name")
      // and under the foreign config the r7 regen created
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
      try assert(shapes(Tables(spark, dir).events) == expected,
        s"operator shapes under NTZ inference, flavor $name")
      finally spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    }
  }
}
