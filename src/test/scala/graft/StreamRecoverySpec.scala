package graft

import java.nio.file.Files

import scala.util.chaining._

import graft.streaming.{ChangeFeed, Sessionize}
import graft.streaming.ChangeFeed.Upsert
import org.apache.spark.sql.Encoders

/** Crash-recovery for the stateful streaming operators: kill a
  * checkpointed query between micro-batches and restart it against the
  * same checkpoint dir. The assertions are chosen so they can ONLY pass
  * if the per-key GroupState was restored — a state-less restart would
  * emit the wrong transition kind (ChangeFeed) or lose the open session
  * (Sessionize) — and so duplicates would also fail them (exact
  * row-level expectations, not counts). */
class StreamRecoverySpec extends SparkSpec {
  import spark.implicits._

  /** The file stream source lists FILES, not the directories
    * `DataFrameWriter.parquet` produces — land each batch as one flat
    * part file inside `dir`. */
  private def landBatch(
      ds: org.apache.spark.sql.Dataset[_], base: String, dir: String,
      name: String): Unit = {
    import java.nio.file.{Files => F, Paths}
    val tmp = s"$base/tmp_$name"
    ds.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    F.createDirectories(Paths.get(dir))
    F.move(part.toPath, Paths.get(dir, s"$name.parquet"))
  }

  test("ChangeFeed: restart from checkpoint resumes per-key state exactly") {
    val base = Files.createTempDirectory("graft_cf_rec").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val schema = Encoders.product[Upsert].schema

    def start() = {
      val src = spark.readStream.schema(schema).parquet(in).as[Upsert]
      ChangeFeed.changes(src).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    // batch 1: three keys appear
    Seq(
      Upsert(1L, 10L, 1.0, deleted = false),
      Upsert(2L, 11L, 2.0, deleted = false),
      Upsert(3L, 12L, 3.0, deleted = false)
    ).toDS().pipe(ds => landBatch(ds, base, in, "b1"))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop() // the "crash": the JVM-side query dies; ckpt survives

    // batch 2 lands while the stream is down
    Seq(
      Upsert(2L, 20L, 9.0, deleted = false), // changed — needs prior state
      Upsert(3L, 21L, 3.0, deleted = true),  // removed — needs prior state
      Upsert(4L, 22L, 4.0, deleted = false), // added
      Upsert(1L, 5L, 99.0, deleted = false)  // stale ver — needs prior state
    ).toDS().pipe(ds => landBatch(ds, base, in, "b2"))

    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(out)
      .select("key", "change", "valueOld", "valueNew")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)))).sortBy(r => (r._1, r._2)).toSeq
    // exact rows: 3 'added' from b1, then the three transitions that are
    // only derivable from RESTORED state (a state-less restart would
    // re-emit key 2/3 as 'added' and accept the stale key-1 upsert)
    assert(got == Seq(
      (1L, "added", None, Some(1.0)),
      (2L, "added", None, Some(2.0)),
      (2L, "changed", Some(2.0), Some(9.0)),
      (3L, "added", None, Some(3.0)),
      (3L, "removed", Some(3.0), None),
      (4L, "added", None, Some(4.0))), s"got $got")
  }

  test("Sessionize: an OPEN session survives restart and closes correctly") {
    val base = Files.createTempDirectory("graft_sess_rec").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val schema = Encoders.product[Sessionize.Event].schema
    val gapMs = 30000L

    def start() = {
      val src = spark.readStream.schema(schema).parquet(in)
      val evs = Sessionize.withEventTimeWatermark(src)
      Sessionize.sessions(evs, gapMs).writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    // batch 1: an OPEN session (two events 10 s apart) — nothing may be
    // emitted yet; the session lives only in GroupState.
    // Timestamps sit well above epoch 0: with EventTimeTimeout, rows at
    // or below the CURRENT watermark are dropped before the state
    // function, and the initial watermark is 0 ms — an event at exactly
    // t=0 silently disappears (observed here; keep test times > 0)
    Seq(
      Sessionize.Event(7L, 1000000L, "click"),
      Sessionize.Event(7L, 1010000L, "view")
    ).toDS().pipe(ds => landBatch(ds, base, in, "b1"))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    assert(!new java.io.File(out).exists() ||
      spark.read.parquet(out).isEmpty, "open session must not emit early")

    // batch 2 after the "crash": an event past the gap closes the held
    // session — its (start, end, n) are recoverable ONLY from state
    landBatch(Seq(Sessionize.Event(7L, 1100000L, "click")).toDS(),
      base, in, "b2")
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(out)
      .as[Sessionize.Session].collect().toSeq
    assert(got == Seq(Sessionize.Session(7L, 1000000L, 1010000L, 2)), s"got $got")
  }
}
