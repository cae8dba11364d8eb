package graft

import graft.ops.Cdc
import graft.streaming.ChangeFeed
import graft.streaming.ChangeFeed.{Change, Upsert}
import org.apache.spark.sql.functions._

/** Streaming change feed vs the relational snapshot diff: the per-batch
  * emissions must equal what Cdc.snapshotDiff shows between the snapshots
  * on either side of that batch. */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot(ups: Seq[Upsert]) =
    Cdc.latestSnapshot(ups.toDF(), Seq("key"), Seq("ver"), Seq("value"),
      deletedCol = Some("deleted"))
      .select(col("key"), col("value"))

  test("micro-batch emissions equal snapshotDiff across the batch boundary") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(
      Upsert(1L, 10L, 1.0, deleted = false),
      Upsert(2L, 11L, 2.0, deleted = false),
      Upsert(3L, 12L, 3.0, deleted = false))
    val b2 = Seq(
      Upsert(2L, 20L, 9.0, deleted = false),  // changed
      Upsert(3L, 21L, 3.0, deleted = true),   // removed
      Upsert(4L, 22L, 4.0, deleted = false),  // added
      Upsert(1L, 5L, 99.0, deleted = false))  // stale version: dropped
    val mem = MemoryStream[Upsert]
    val q = ChangeFeed.changes(mem.toDS()).writeStream
      .format("memory").queryName("cf_out").outputMode("append").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      val afterB1 = spark.sql("SELECT * FROM cf_out").as[Change]
        .collect().sortBy(_.key).toSeq
      assert(afterB1.map(c => (c.key, c.change)) ==
        Seq((1L, "added"), (2L, "added"), (3L, "added")))
      mem.addData(b2: _*); q.processAllAvailable()
      val batch2 = spark.sql("SELECT * FROM cf_out").as[Change]
        .collect().sortBy(_.key).toSeq.diff(afterB1)
      // the stream's batch-2 net emissions == the relational diff of the
      // snapshots on either side of the batch boundary
      val want = Cdc.snapshotDiff(
        snapshot(b1), snapshot(b1 ++ b2), Seq("key"), Seq("value"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(batch2.map(c => (c.key, c.change)).sorted == want)
      assert(want == Seq((2L, "changed"), (3L, "removed"), (4L, "added")))
      // the stale key-1 upsert emitted nothing and did not regress state
      assert(!batch2.exists(_.key == 1L))
    } finally q.stop()
  }

  test("batch mode: net emissions are the added-side of a diff vs empty; intra-batch churn collapses") {
    val ups = Seq(
      Upsert(1L, 1L, 5.0, deleted = false),
      Upsert(1L, 2L, 6.0, deleted = false),  // same batch: nets to one added@6.0
      Upsert(2L, 1L, 7.0, deleted = false),
      Upsert(2L, 2L, 7.0, deleted = true),   // added then tombstoned: nothing
      Upsert(3L, 1L, 8.0, deleted = true))   // born dead: nothing
    val got = ChangeFeed.changes(ups.toDS())
      .collect().sortBy(_.key).toSeq
    assert(got == Seq(Change(1L, "added", None, Some(6.0), 2L)))
  }

  test("NaN follows SQL <=> semantics: NaN->NaN is unchanged, NaN->value is changed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Upsert]
    val q = ChangeFeed.changes(mem.toDS()).writeStream
      .format("memory").queryName("cf_nan").outputMode("append").start()
    try {
      mem.addData(Upsert(1L, 1L, Double.NaN, deleted = false)); q.processAllAvailable()
      mem.addData(Upsert(1L, 2L, Double.NaN, deleted = false)); q.processAllAvailable()
      mem.addData(Upsert(1L, 3L, 1.0, deleted = false)); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM cf_nan").as[Change]
        .collect().sortBy(_.ver).map(_.change).toSeq
      // added (NaN), no row for NaN->NaN (matches snapshotDiff's <=>),
      // changed for NaN->1.0
      assert(got == Seq("added", "changed"))
    } finally q.stop()
  }

  test("dedupWithinWatermark: in-horizon re-deliveries dropped, expired ids re-emit, batch = plain dedup") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    final case class Arrival(id: String, tsMs: Long, v: String)
    val mem = MemoryStream[(String, Long, String)]
    val src = mem.toDF().toDF("id", "tsMs", "v")
      .withColumn("ts", timestamp_millis(col("tsMs")))
    val q = streaming.StreamChannels
      .dedupWithinWatermark(src, "id", "ts", "10 seconds")
      .writeStream.format("memory").queryName("dd_out").outputMode("append").start()
    try {
      mem.addData(("a", 10000L, "1"), ("b", 11000L, "2")); q.processAllAvailable()
      mem.addData(("a", 12000L, "dup"), ("c", 13000L, "3")); q.processAllAvailable()
      mem.addData(("z", 100000L, "4")); q.processAllAvailable() // advances watermark past a's horizon
      mem.addData(("a", 95000L, "again")); q.processAllAvailable()
      val got = spark.sql("SELECT id, v FROM dd_out ORDER BY tsMs")
        .as[(String, String)].collect().toSeq
      // the in-horizon re-delivery of 'a' is dropped; after its state
      // expired (watermark 90s > 10s+10s) the id legitimately re-emits —
      // the bounded-state contract, vs dropDuplicates' forever-state
      assert(got == Seq(("a", "1"), ("b", "2"), ("c", "3"), ("a", "again"), ("z", "4")))
    } finally q.stop()
    // batch form: plain exact dedup, no horizon
    val batch = Seq(("a", 1L, "x"), ("a", 2L, "y"), ("b", 3L, "z"))
      .toDF("id", "tsMs", "v").withColumn("ts", timestamp_millis(col("tsMs")))
    assert(streaming.StreamChannels.dedupWithinWatermark(batch, "id", "ts", "10 seconds")
      .count() == 2)
  }

  test("tombstone then re-add across batches: removed, then added again") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Upsert]
    val q = ChangeFeed.changes(mem.toDS()).writeStream
      .format("memory").queryName("cf_readd").outputMode("append").start()
    try {
      mem.addData(Upsert(7L, 1L, 1.0, deleted = false)); q.processAllAvailable()
      mem.addData(Upsert(7L, 2L, 1.0, deleted = true)); q.processAllAvailable()
      mem.addData(Upsert(7L, 3L, 2.0, deleted = false)); q.processAllAvailable()
      val got = spark.sql("SELECT * FROM cf_readd").as[Change]
        .collect().sortBy(_.ver).toSeq
      assert(got.map(_.change) == Seq("added", "removed", "added"))
      assert(got.last.valueNew.contains(2.0))
    } finally q.stop()
  }
}
