package graft

import graft.store.{KVState, MessageStore, RetryStore, Search}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StoreSpec extends SparkSpec {
  import spark.implicits._

  private def msgs = Seq(
    ("a", "2024-01-01 10:00:00", "hello world", "click", "5"),
    ("b", "2024-01-02 10:00:00", "goodbye world", "view", "15"),
    ("c", "2024-01-03 10:00:00", "hello again", "click", "25"),
    ("d", "2024-01-04 10:00:00", "nothing here", "view", "abc"))
    .toDF("uuid", "ts0", "payload", "et", "k")
    .withColumn("ts", col("ts0").cast("timestamp"))
    .withColumn("meta", map(lit("et"), col("et"), lit("k"), col("k")))
    .drop("ts0", "et", "k")

  test("search: date range + text") {
    val r = MessageStore.search(msgs, Search(
      startDt = Some("2024-01-01 12:00:00"), text = Some("hello")))
    assert(r.select("uuid").as[String].collect().toSeq == Seq("c"))
  }

  test("search: rtext regex") {
    val r = MessageStore.search(msgs, Search(rtext = Some("^good.*world$")))
    assert(r.select("uuid").as[String].collect().toSeq == Seq("b"))
  }

  test("search: meta exact + numeric range excludes non-numeric like reference isfloat guard") {
    val r = MessageStore.search(msgs, Search(
      metaStart = Map("k" -> 10.0), metaEnd = Map("k" -> 30.0)))
    assert(r.select("uuid").as[String].collect().toSeq == Seq("b", "c"))
  }

  test("search: meta order_by desc + pagination") {
    val r = MessageStore.search(msgs, Search(orderBy = "-meta:k", count = 2, start = 1))
    // string sort desc on k: 'abc','5','25','15' → skip 1 take 2
    assert(r.select("uuid").as[String].collect().toSeq == Seq("a", "c"))
  }

  test("search: startId keyset pagination resumes after anchor, excluded") {
    val r = MessageStore.search(msgs, Search(startId = Some("b"), count = 10))
    assert(r.select("uuid").as[String].collect().toSeq == Seq("c", "d"))
  }

  test("search: startAfter caller-supplied anchor paginates without an anchor scan") {
    val page1 = MessageStore.search(msgs, Search(count = 2))
      .select(col("uuid"), unix_millis(col("ts"))).as[(String, Long)].collect()
    assert(page1.map(_._1).toSeq == Seq("a", "b"))
    val (lastUuid, lastTs) = (page1.last._1, page1.last._2)
    val page2 = MessageStore.search(msgs,
      Search(count = 2, startAfter = Some((lastTs, lastUuid))))
    assert(page2.select("uuid").as[String].collect().toSeq == Seq("c", "d"))
  }

  test("search: reverse '-timestamp' keyset pagination advances OLDER, never re-serves page 1") {
    val page1 = MessageStore.search(msgs, Search(orderBy = "-timestamp", count = 2))
      .select(col("uuid"), unix_millis(col("ts"))).as[(String, Long)].collect()
    assert(page1.map(_._1).toSeq == Seq("d", "c"))
    val (lastUuid, lastTs) = (page1.last._1, page1.last._2)
    val page2 = MessageStore.search(msgs,
      Search(orderBy = "-timestamp", count = 2, startAfter = Some((lastTs, lastUuid))))
    assert(page2.select("uuid").as[String].collect().toSeq == Seq("b", "a"))
    // id-anchored form under the reverse order resolves the same page
    val byId = MessageStore.search(msgs,
      Search(orderBy = "-timestamp", count = 2, startId = Some("c")))
    assert(byId.select("uuid").as[String].collect().toSeq == Seq("b", "a"))
    // non-timestamp orderings refuse an id anchor instead of ignoring it
    intercept[IllegalArgumentException] {
      MessageStore.search(msgs, Search(orderBy = "-meta:k", startId = Some("b"))).collect()
    }
  }

  test("MessageStore save/search/total/replay over parquet") {
    val dir = Files.createTempDirectory("graft_store").toString
    val store = new MessageStore(spark, s"$dir/msgs")
    store.save(msgs)
    assert(store.total() == 4)
    val found = store.search(Search(metaExact = Map("et" -> "click"), count = 10))
    assert(found.count() == 2)
    val replayed = store.replay(
      Search(metaExact = Map("et" -> "click"), count = 10),
      graft.api.Channel("re").add(graft.ops.CoreOps.mapPayload("u")(upper)))
    assert(replayed.select("payload").as[String].collect().forall(_.head.isUpper))
  }

  test("sendTo posts filtered store contents to an endpoint (send_from_store parity)") {
    import graft.net.{HttpResponse, MockTransport}
    val dir = Files.createTempDirectory("graft_store_send").toString
    val store = new MessageStore(spark, s"$dir/msgs")
    store.save(Seq(
      ("a", "2024-01-01 10:00:00", """{"alpha":"x1"}"""),
      ("b", "2024-01-02 10:00:00", """{"alpha":"x2"}"""),
      ("c", "2024-01-03 10:00:00", """{"alpha":"x1"}"""))
      .toDF("uuid", "ts0", "payload")
      .withColumn("ts", col("ts0").cast("timestamp"))
      .withColumn("meta", map().cast("map<string,string>"))
      .drop("ts0"))
    val echo = MockTransport(req =>
      HttpResponse(200, s"${req.method} ${req.url} body=${req.body.getOrElse("-")}"))
    // view_store Filter name=value semantics: payload field equality
    val out = store.sendTo(Search(count = 10), echo, "http://dst/in",
      payloadFilter = Some("alpha" -> "x1"))
      .orderBy("uuid")
      .select(col("uuid"), col("payload"), element_at(col("meta"), "status_code").as("st"))
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "c"))
    assert(out.forall(_.getString(1) == """POST http://dst/in body={"alpha":"x1"}"""))
    assert(out.forall(_.getString(2) == "200"))
  }

  test("retry schedule: attempts and capped exponential backoff") {
    val df = Seq((1, "2024-01-01 00:00:00", 1), (1, "2024-01-01 00:01:00", 2),
      (2, "2024-01-01 00:00:30", 3))
      .toDF("key", "ts0", "seq").withColumn("ts", col("ts0").cast("timestamp"))
    val sch = RetryStore.schedule(df, "key", "ts", "seq", baseSec = 1, maxBackoffSec = 3)
      .orderBy("key", "attempt")
      .select("key", "attempt", "backoff_sec").as[(Int, Long, Long)].collect().toSeq
    assert(sch == Seq((1, 1L, 2L), (1, 2L, 3L), (2, 1L, 2L))) // 2^1=2, 2^2=4→cap 3
  }

  test("retry due: only elapsed rows, in order") {
    val df = Seq((1, "2024-01-01 00:00:00", 1), (1, "2024-01-01 00:01:00", 2))
      .toDF("key", "ts0", "seq").withColumn("ts", col("ts0").cast("timestamp"))
    val sch = RetryStore.schedule(df, "key", "ts", "seq")
    val cutoff = java.sql.Timestamp.valueOf("2024-01-01 00:00:30").getTime
    val due = RetryStore.due(sch, cutoff, "ts", "seq")
    assert(due.select("seq").as[Int].collect().toSeq == Seq(1))
  }

  test("retry roundtrip: failed rows parked, due rows re-processed") {
    import graft.api.{Channel, Node}
    // a channel whose node "fails" on flagged rows → reject-side = park
    val input = Seq((1, "ok", "2024-01-01 00:00:00"), (2, "flaky", "2024-01-01 00:00:01"),
      (3, "flaky", "2024-01-01 00:00:02"))
      .toDF("id", "kind", "ts0").withColumn("ts", col("ts0").cast("timestamp")).drop("ts0")
    val firstTry = Channel("flaky")
      .rejectWhen(col("kind") === "flaky")
      .add(Node("work")(_.withColumn("result", lit("done"))))
      .run(input)
    assert(firstTry.main.count() == 1)
    // park rejected rows with backoff schedule
    val parked = RetryStore.schedule(firstTry.rejected.get, "kind", "ts", "id")
    // nothing due immediately before the backoff elapses
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:01").getTime
    assert(RetryStore.due(parked, t0, "ts", "id").count() == 0)
    // after backoff, both are due in arrival order; re-run succeeds
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 01:00:00").getTime
    val due = RetryStore.due(parked, t1, "ts", "id")
    assert(due.select("id").as[Int].collect().toSeq == Seq(2, 3))
    val retried = Channel("retry")
      .add(Node("work")(_.withColumn("result", lit("done"))))
      .run(due.drop("attempt", "backoff_sec", "next_try_ms"))
    assert(retried.main.count() == 2)
  }

  test("MemoryMessageStore: save/search/state-change/delete/replay parity") {
    val store = new graft.store.MemoryMessageStore(spark)
    assert(store.isEmpty && store.total() == 0)
    store.save(msgs.withColumn("state", lit("pending")))
    assert(store.total() == 4)
    assert(store.search(Search(text = Some("hello"), count = 10)).count() == 2)
    store.changeMessageState("b", "error")
    assert(store.all().filter(col("uuid") === "b" && col("state") === "error").count() == 1)
    store.delete("d")
    assert(store.total() == 3)
    val replayed = store.replay(Search(count = 10),
      graft.api.Channel("re").add(graft.ops.CoreOps.mapPayload("u")(upper)))
    assert(replayed.select("payload").as[String].collect().forall(_.head.isUpper))
  }

  test("MessageStore (parquet): changeMessageState/delete/get parity with the memory store") {
    val dir = Files.createTempDirectory("graft_store_mut").toString
    val store = new MessageStore(spark, s"$dir/msgs")
    store.save(msgs.withColumn("state", lit("pending")))
    assert(store.total() == 4)
    // change_message_state: latest mutation wins across multiple appends
    store.changeMessageState("b", "error")
    store.changeMessageState("b", "processed")
    assert(store.get("b").map(_.getAs[String]("state")) == Some("processed"))
    assert(store.get("a").map(_.getAs[String]("state")) == Some("pending"))
    // delete: tombstone is terminal — a later state change cannot resurrect
    store.delete("d")
    store.changeMessageState("d", "processed")
    assert(store.total() == 3)
    assert(store.get("d").isEmpty)
    // search sees reconciled state
    val errFree = store.search(Search(count = 10))
    assert(errFree.filter(col("state") === "processed").count() == 1)
    // compact folds the log into the base table and clears it
    store.compact()
    assert(store.total() == 3)
    assert(store.get("b").map(_.getAs[String]("state")) == Some("processed"))
    assert(store.get("d").isEmpty)
  }

  test("MessageStore (parquet): compact of an all-tombstoned store is the empty store") {
    val dir = Files.createTempDirectory("graft_store_empty").toString
    val store = new MessageStore(spark, s"$dir/msgs")
    store.save(msgs.limit(1).withColumn("state", lit("pending")))
    store.delete("a")
    assert(store.total() == 0)
    store.compact() // must not leave an uninferrable schema-less directory
    assert(store.total() == 0)
    intercept[NoSuchElementException](store.all())
    // the empty store accepts new messages again
    store.save(msgs.limit(2).withColumn("state", lit("pending")))
    assert(store.total() == 2)
  }

  test("MessageStore (parquet): interrupted compact swap is recovered, not deleted") {
    val dir = Files.createTempDirectory("graft_store_crash").toString
    val store = new MessageStore(spark, s"$dir/msgs")
    store.save(msgs.withColumn("state", lit("pending")))
    store.changeMessageState("b", "processed")
    // simulate the crash window between delete(base) and rename(staging):
    // the staged copy exists, the base is gone
    Files.move(java.nio.file.Paths.get(s"$dir/msgs"),
      java.nio.file.Paths.get(s"$dir/msgs.compacting"))
    assert(store.total() == 0) // base missing
    store.compact() // recovery must PROMOTE the staged copy
    assert(store.total() == 4)
    assert(store.get("b").map(_.getAs[String]("state")) == Some("processed"))
  }

  test("MessageStore (parquet): auto-compact bounds the mutation log under churn") {
    val dir = Files.createTempDirectory("graft_store_auto").toString
    // tiny threshold so the policy fires many times in-test
    val store = new MessageStore(spark, s"$dir/msgs", autoCompactMutationFiles = 4)
    store.save(msgs.withColumn("state", lit("pending")))
    val states = Seq("error", "pending", "processed")
    for (i <- 0 until 20) // continuous changeMessageState churn
      store.changeMessageState(Seq("a", "b", "c")(i % 3), states(i % 3))
    // the log NEVER exceeds the threshold: each append is followed by the
    // policy check, so post-call the count is < threshold (it was folded)
    // or < threshold files strictly below it
    assert(store.mutationLogFiles < 4,
      s"log grew to ${store.mutationLogFiles} files despite auto-compact")
    // correctness under repeated folds: latest state per uuid survives
    assert(store.total() == 4)
    assert(store.get("a").map(_.getAs[String]("state")) == Some("error"))
    assert(store.get("b").map(_.getAs[String]("state")) == Some("pending"))
    assert(store.get("c").map(_.getAs[String]("state")) == Some("processed"))
    // tombstones survive folds too
    store.delete("d")
    for (i <- 0 until 6)
      store.changeMessageState("a", states(i % 3))
    assert(store.total() == 3 && store.get("d").isEmpty)
    assert(store.mutationLogFiles < 4)
    // disabled policy (0): the log grows freely until a manual compact
    val manual = new MessageStore(spark, s"$dir/manual", autoCompactMutationFiles = 0)
    manual.save(msgs.withColumn("state", lit("pending")))
    for (_ <- 0 until 6) manual.changeMessageState("a", "error")
    assert(manual.mutationLogFiles == 6)
    manual.compact()
    assert(manual.mutationLogFiles == 0)
    assert(manual.get("a").map(_.getAs[String]("state")) == Some("error"))
  }

  test("MessageStore (parquet): concurrent mutators serialize under the store lease") {
    val dir = Files.createTempDirectory("graft_store_lock").toString
    // explicit generous lockWaitMs: the test asserts SERIALIZATION, not
    // latency — under a full parallel suite on a steal-heavy host one
    // holder's compact can exceed the 30 s production default and the
    // waiter's loud failure would flake the test (r13: one such flake at
    // a probed 24% CPU steal; the run passes in isolation)
    val a = new MessageStore(spark, s"$dir/msgs",
      autoCompactMutationFiles = 3, lockWaitMs = 180000)
    a.save(msgs.withColumn("state", lit("pending")))
    // second instance on the SAME path = a second admin process; the tiny
    // auto-compact threshold forces compacts (the read→swap window where
    // an unserialized concurrent append would be silently lost)
    val b = new MessageStore(spark, s"$dir/msgs",
      autoCompactMutationFiles = 3, lockWaitMs = 180000)
    val states = Seq("error", "pending", "processed")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def churn(st: MessageStore, uuid: String) = new Thread(() =>
      try for (i <- 0 until 10) st.changeMessageState(uuid, states(i % 3))
      catch { case t: Throwable => errs.add(t): Unit })
    val (t1, t2) = (churn(a, "a"), churn(b, "b"))
    t1.start(); t2.start(); t1.join(300000); t2.join(300000)
    assert(errs.isEmpty, s"concurrent mutators failed: ${errs.peek()}")
    // no lost updates across the interleaved compacts: both writers' final
    // states visible, nothing tombstoned, the lease file released
    assert(a.total() == 4)
    assert(a.get("a").map(_.getAs[String]("state")) == Some("error"))
    assert(a.get("b").map(_.getAs[String]("state")) == Some("error"))
    assert(!Files.exists(java.nio.file.Paths.get(s"$dir/msgs.lock")))
  }

  test("MessageStore (parquet): a held foreign lease fails loudly; a stale one is broken") {
    val dir = Files.createTempDirectory("graft_store_lease").toString
    val store = new MessageStore(spark, s"$dir/msgs",
      lockWaitMs = 300, staleLockMs = 60000)
    store.save(msgs.withColumn("state", lit("pending")))
    // simulate a live foreign holder: fresh lock file, well under staleLockMs
    val lock = java.nio.file.Paths.get(s"$dir/msgs.lock")
    Files.writeString(lock, "foreign 0 0")
    intercept[java.util.ConcurrentModificationException](
      store.changeMessageState("a", "error"))
    // the blocked mutation must NOT have been applied
    assert(store.get("a").map(_.getAs[String]("state")) == Some("pending"))
    // same lock, but aged past staleLockMs: presumed crashed, broken, and
    // the mutation proceeds
    val stale = new MessageStore(spark, s"$dir/msgs",
      lockWaitMs = 5000, staleLockMs = 50)
    Thread.sleep(100) // let the existing lease age past 50 ms
    stale.changeMessageState("a", "error")
    assert(stale.get("a").map(_.getAs[String]("state")) == Some("error"))
    assert(!Files.exists(lock)) // released after the break-and-acquire
  }

  test("MessageStore (parquet): a mutation on an empty store does not poison reads") {
    val dir = Files.createTempDirectory("graft_store_ghost").toString
    val store = new MessageStore(spark, s"$dir/msgs")
    store.changeMessageState("ghost", "processed") // creates only _mutations
    assert(store.total() == 0)
    intercept[NoSuchElementException](store.all())
    store.save(msgs.withColumn("state", lit("pending")))
    assert(store.total() == 4) // ghost mutation matches nothing, reads work
  }

  test("MessageStore (parquet): replay renews and saves results back as processed") {
    val dir = Files.createTempDirectory("graft_store_replay").toString
    val store = new MessageStore(spark, s"$dir/msgs")
    store.save(msgs) // no state column → stored as pending (msgstore.py:630)
    val replayed = store.replay(
      Search(metaExact = Map("et" -> "click"), count = 10),
      graft.api.Channel("re2").add(graft.ops.CoreOps.mapPayload("u")(upper)))
    assert(replayed.count() == 2)
    // renewed: fresh uuids, state processed, persisted as new store entries
    assert(store.total() == 6)
    val processed = store.search(Search(metaExact = Map("et" -> "click"), count = 10))
      .filter(col("state") === "processed")
    assert(processed.count() == 2)
    assert(processed.select("payload").as[String].collect().forall(_.head.isUpper))
    val originals = replayed.select("uuid").as[String].collect().toSet
      .intersect(Set("a", "c"))
    assert(originals.isEmpty) // uuids were renewed
  }

  test("KVState store/get latest-version semantics") {
    val dir = Files.createTempDirectory("graft_kv").toString
    val kv = new KVState(spark, s"$dir/state")
    assert(kv.get("n1", "k") == None)
    kv.store("n1", "k", "v1")
    kv.store("n1", "k", "v2")
    assert(kv.get("n1", "k") == Some("v2"))
    assert(kv.get("n2", "k") == None)
  }
}
