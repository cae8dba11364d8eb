package graft

import graft.streaming.ChangeFeed
import graft.streaming.ChangeFeed.Upsert

/** The stateful streaming tier on the PRODUCTION state backend:
  * [[GraftSession.useRocksDBStateStore]] switches
  * `spark.sql.streaming.stateStore.providerClass` to Spark's RocksDB
  * provider (off-heap LSM state with disk spill — the backend that
  * survives 100 TB key cardinality, where the default executor-heap
  * provider is a designed-in OOM). This spec pins the two facts the
  * bench rows rest on: emissions are IDENTICAL to the heap provider on
  * the same input, and the query really ran on RocksDB (provider-
  * specific state metrics present), i.e. the conf switch is not a
  * silent no-op. */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  test("ChangeFeed on RocksDB state store: emissions equal the heap provider's, rocksdb metrics present") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(
      Upsert(1L, 10L, 1.0, deleted = false),
      Upsert(2L, 11L, 2.0, deleted = false))
    val b2 = Seq(
      Upsert(2L, 20L, 9.0, deleted = false), // changed
      Upsert(3L, 21L, 3.0, deleted = false), // added
      Upsert(1L, 30L, 1.0, deleted = true))  // removed

    def runWith(rocks: Boolean, name: String): (Seq[(Long, String)], Set[String]) = {
      val prev =
        if (rocks) Some(GraftSession.useRocksDBStateStore(spark)) else None
      try {
        val mem = MemoryStream[Upsert]
        val q = ChangeFeed.changes(mem.toDS()).writeStream
          .format("memory").queryName(name).outputMode("append").start()
        try {
          mem.addData(b1: _*); q.processAllAvailable()
          mem.addData(b2: _*); q.processAllAvailable()
          val rows = spark.sql(s"SELECT key, change FROM $name")
            .as[(Long, String)].collect().sorted.toSeq
          val metrics = q.recentProgress.toSeq
            .flatMap(_.stateOperators.toSeq)
            .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
            .toSet
          (rows, metrics)
        } finally q.stop()
      } finally prev.foreach(GraftSession.restoreStateStore(spark, _))
    }

    val (heapRows, _) = runWith(rocks = false, "rdb_heap")
    val (rocksRows, rocksMetrics) = runWith(rocks = true, "rdb_rocks")
    assert(rocksRows.nonEmpty)
    assert(rocksRows == heapRows)
    // the provider actually engaged: RocksDB-specific state store metrics
    assert(rocksMetrics.exists(_.toLowerCase.contains("rocksdb")),
      s"no rocksdb metrics in: $rocksMetrics")
    // and the switch was cleanly restored for subsequent suites
    assert(!spark.conf
      .getOption("spark.sql.streaming.stateStore.providerClass")
      .contains(GraftSession.RocksDBStateProvider))
  }
}
