package graft

import graft.api.{Channel, Nodes}
import graft.model.Msg
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Port-parity: a pypeman-style pipeline written with reference-named node
  * constructors runs end to end. */
class NodesParitySpec extends SparkSpec {
  import spark.implicits._

  test("pypeman-named pipeline: json → map → csv out") {
    val in = Seq("""{"id": 1, "name": "ann"}""", """{"id": 2, "name": "bob"}""")
      .toDF("payload")
      .withColumn("meta", map().cast(MapType(StringType, StringType)))
      .withColumn("ctx", map().cast(Msg.ctxType))

    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val out = Channel("port")
      .add(
        Nodes.JsonToPython(schema),
        Nodes.FuncNode("noop")(identity),
        Nodes.MsgFuncNode("flatten")(df => df.select(col("payload.*"), col("meta"), col("ctx"))))
      .add(Nodes.Python2CSVstr(Seq(col("id"), upper(col("name")))))
      .runMain(in)
      .select("payload").as[String].collect().sorted.toSeq
    assert(out == Seq("1,ANN", "2,BOB"))
  }

  test("pypeman-named pipeline: b64 + encode roundtrip") {
    val in = Seq("hello").toDF("payload")
    val out = Channel("rt")
      .add(Nodes.Encode(), Nodes.B64Encode(), Nodes.B64Decode(), Nodes.Decode())
      .runMain(in).select("payload").as[String].head()
    assert(out == "hello")
  }

  test("pypeman-named pipeline: hl7 parse picks segments") {
    val in = Seq("MSH|^~&|APP\rPID|7|Doe").toDF("payload")
    val out = Channel("hl7").add(Nodes.HL7ToPython()).runMain(in)
      .select(element_at(element_at(col("payload"), 2), 3).as("name"))
      .as[String].head()
    assert(out == "Doe")
  }

  test("fail-path parity: malformed JSON routes to rejects (fail_nodes)") {
    val in = Seq("""{"id": 1}""", "not json at all").toDF("payload")
    val schema = StructType(Seq(StructField("id", LongType)))
    val r = Channel("failpath")
      .add(Nodes.JsonToPython(schema))
      .rejectWhen(col("payload").isNull || col("payload.id").isNull)
      .run(in)
    assert(r.main.count() == 1)
    assert(r.rejected.get.count() == 1)
  }

  test("fail vs reject parity: distinct paths, distinct states, fail outranks (channels.py:80-81)") {
    // pypeman distinguishes FAIL (a node raises → fail_nodes → state
    // `error`) from REJECT (explicit verdict → reject_nodes → `rejected`).
    // failWhen fires first — a row matching both lands in fails, mirroring
    // the raise preempting any later routing.
    val in = Seq(
      (1L, "ok", 5.0), (2L, "error", 5.0), (3L, "ok", 99.0), (4L, "error", 99.0))
      .toDF("id", "event_type", "value")
      .withColumn("state", lit(Msg.PROCESSED))
    var failNodeSaw = -1L
    var rejectNodeSaw = -1L
    val r = Channel("fvr")
      .failWhen(col("value") > 90)
      .rejectWhen(col("event_type") === "error")
      .addFailNodes(
        graft.ops.CoreOps.markState(Msg.ERROR),
        graft.api.Node("notify_ops") { df => failNodeSaw = df.count(); df })
      .addRejectNodes(
        graft.ops.CoreOps.markState(Msg.REJECTED),
        graft.api.Node("notify_sender") { df => rejectNodeSaw = df.count(); df })
      .run(in)
    // routing: 3 and 4 fail (4 matches both → fail wins), 2 rejects, 1 mains
    assert(r.main.select("id").as[Long].collect().toSet == Set(1L))
    assert(r.failedMsgs.get.select("id").as[Long].collect().toSet == Set(3L, 4L))
    assert(r.rejected.get.select("id").as[Long].collect().toSet == Set(2L))
    // the side-output end nodes ran on their own stream only
    assert(failNodeSaw == 2L && rejectNodeSaw == 1L)
    // states are distinct and worst-state ranks error above rejected
    val states = r.failedMsgs.get.unionByName(r.rejected.get).unionByName(r.main)
      .select(lit(1).as("k"), col("state"))
    val worst = states.groupBy("k")
      .agg(Msg.worstState(col("state")).as("w"))
      .select("w").as[String].head()
    assert(worst == Msg.ERROR)
  }

  test("SQL surface: native vector functions callable from spark.sql") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine", es => graft.plans.CosineSimilarity(es(0), es(1)), "scala_udf")
    val c = spark.sql(
      "SELECT vec_cosine(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS c")
      .as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
    // and through the Column API with mixed float/double arrays
    val df = Seq((Array(1.0f, 0.0f), Array(1.0, 0.0))).toDF("a", "b")
    val c2 = df.select(graft.plans.VectorFunctions.vecCosine(col("a"), col("b")))
      .as[Double].head()
    assert(math.abs(c2 - 1.0) < 1e-12)
  }

  test("Drop/Reject channel-level routing") {
    val in = Seq(1, 2, 3, 4).toDF("payload")
    val r = Nodes.Drop(col("payload") > 3)(
      Nodes.Reject(col("payload") === 1)(Channel("dr"))).run(in)
    assert(r.main.as[Int].collect().sorted.toSeq == Seq(2, 3))
    assert(r.dropped.get.count() == 1 && r.rejected.get.count() == 1)
  }

  // ---- BaseNode option parity (nodes.py:114-180) --------------------------

  private def msgIn = Seq(("hello", "x")).toDF("payload", "tag")
    .withColumn("meta", map(lit("tag"), col("tag")))
    .withColumn("ctx", map().cast(Msg.ctxType))

  test("store_input_as / store_output_as snapshot payload+meta around the node (nodes.py:114)") {
    val node = graft.api.Node("up")(_.withColumn("payload", upper(col("payload"))))
      .withStoreInputAs("in_snap").withStoreOutputAs("out_snap")
    val row = Channel("opts").add(node).runMain(msgIn)
      .select(
        col("payload"),
        col("ctx")("in_snap").getField("payload"),
        col("ctx")("out_snap").getField("payload"),
        col("ctx")("in_snap").getField("meta")("tag"))
      .as[(String, String, String, String)].head()
    assert(row == (("HELLO", "hello", "HELLO", "x")))
  }

  test("RaiseError fails the job when a row reaches it (nodes.py:353)") {
    val ex = intercept[Exception] {
      Channel("boom").add(Nodes.RaiseError()).runMain(msgIn).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("Test node")))
  }

  test("RaiseError behind autoRetryOn diverts instead of failing (auto_retry_exceptions)") {
    val r = Channel("safe")
      .add(Nodes.RaiseError().withAutoRetry(lit(true)))
      .run(msgIn)
    assert(r.main.count() == 0) // nothing reaches the raising node
    assert(r.retried.get.count() == 1) // the old message is parked
  }

  test("store_meta: channel collects names, store materializes value LISTS (yielded submessages)") {
    val node = graft.api.Node("route")(
      _.withColumn("meta", map(lit("dest"), concat(lit("d"), col("part")))))
      .withStoreMeta("dest")
    val chan = Channel("sm").add(
      graft.ops.CoreOps.yielder(split(lit("a b"), " "), "part"), node)
    assert(chan.storeMetaNames == Set("dest"))
    val msgs = chan.runMain(msgIn.withColumn("uuid", lit("m1")))
    val infos = graft.store.MessageStore.metaInfos(msgs, Seq("dest"))
      .select("uuid", "name", "values").as[(String, String, Seq[String])].head()
    // one message yielded into 2 submessages → both values stored as a list
    assert(infos == (("m1", "dest", Seq("da", "db"))))
  }

  test("log_output is benign and returns the node output unchanged") {
    val node = graft.api.Node("quiet")(_.withColumn("payload", lower(col("payload")))).withLogOutput
    val out = Channel("log").add(node).runMain(msgIn).select("payload").as[String].head()
    assert(out == "hello")
  }
}
