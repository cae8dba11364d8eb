package graft

import graft.api.{Channel, Node}
import graft.model.Msg
import graft.ops.{CoreOps, JoinMapItem, MapItem}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}
import Queries.Q

/** Queries exercising the message model and channel algebra (§2.1). */
object MessageQueries {

  /** Msg.wrap determinism: payload JSON + content-derived uuid. */
  val qMsgWrap = Q(
    "q_msg_wrap",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
        .filter(col("l_orderkey") < 100)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
      Msg.wrap(li).select(col("uuid"), col("payload"), col("state"))
    },
    Some("""SELECT md5(j) AS uuid, j AS payload, 'pending' AS state FROM (
              SELECT to_json(struct_pack(
                l_orderkey := l_orderkey, l_linenumber := l_linenumber,
                l_quantity := l_quantity, l_returnflag := l_returnflag))::VARCHAR AS j
              FROM lineitem WHERE l_orderkey < 100)"""))

  /** Node chaining incl. a passthrough node whose effect must be discarded. */
  val qChannelChain = Q(
    "q_channel_chain",
    (s, dir) => {
      val ch = Channel("chain")
        .add(
          Node("rich")(_.filter(col("c_acctbal") > 1000)),
          Node.mapColumn("upperName", "c_name")(upper),
          // passthrough: runs (lazily) but its output is discarded
          Node("corrupting", _.withColumn("c_custkey", lit(-1)), passthrough = true),
          CoreOps.project(Seq("c_custkey", "c_name", "c_mktsegment")))
      ch.runMain(Tables(s, dir).customer)
    },
    Some("""SELECT c_custkey, upper(c_name) AS c_name, c_mktsegment
            FROM customer WHERE c_acctbal > 1000"""))

  /** fork + MergeChannel: side branch and main branch unioned and counted. */
  val qForkMerge = Q(
    "q_fork_merge",
    (s, dir) => {
      val ch = Channel("fm")
        .fork("open") { f =>
          f.add(Node("o")(df => df.filter(col("o_orderstatus") === "O")
            .select(col("o_orderkey"), lit("open").as("route"))))
        }
        .add(Node("f")(df => df.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), lit("closed").as("route"))))
      val r = ch.run(Tables(s, dir).orders)
      Channel.merge(r.main, r.forks("open"))
        .groupBy(col("route"))
        .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
    },
    Some("""SELECT route, count(*) AS n, min(o_orderkey) AS min_key,
              max(o_orderkey) AS max_key FROM (
              SELECT o_orderkey, 'open' AS route FROM orders WHERE o_orderstatus = 'O'
              UNION ALL
              SELECT o_orderkey, 'closed' AS route FROM orders WHERE o_orderstatus = 'F')
            GROUP BY route"""))

  /** when: conditional sub-pipeline, others pass through untouched. */
  val qWhen = Q(
    "q_when",
    (s, dir) => {
      val ev = Tables(s, dir).events
        .select(col("event_id"), col("event_type"), col("props").as("payload"))
      Channel("w")
        .when(col("event_type") === "error") {
          _.add(CoreOps.mapPayload("shout")(upper))
        }
        .runMain(ev)
        .select(col("event_id"), col("payload"))
    },
    Some("""SELECT event_id,
              CASE WHEN event_type = 'error' THEN upper(props) ELSE props END AS payload
            FROM events"""))

  /** case: first-true-wins multi-branch routing (branches overlap). */
  val qCaseRouting = Q(
    "q_case_routing",
    (s, dir) => {
      val ev = Tables(s, dir).events.withColumn("route", lit("high"))
      Channel("c")
        .caseOf(
          (col("value") < 25, (c: Channel) => c.add(Node("low")(_.withColumn("route", lit("low"))))),
          (col("value") < 75, (c: Channel) => c.add(Node("mid")(_.withColumn("route", lit("mid"))))))
        .runMain(ev)
        .groupBy(col("route"))
        .agg(count(lit(1)).as("n"), round(sum(floor(col("value") * 100 + lit(0.5)).cast("long")) / 100.0, 4).as("total_value"))
    },
    Some("""SELECT CASE WHEN value < 25 THEN 'low'
                        WHEN value < 75 THEN 'mid'
                        ELSE 'high' END AS route,
              count(*) AS n, round(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0, 4) AS total_value
            FROM events GROUP BY 1"""))

  /** Drop node / drop_nodes side output. */
  val qFilterDrop = Q(
    "q_filter_drop",
    (s, dir) => {
      val r = Channel("d").dropWhen(col("value") < 10).run(Tables(s, dir).events)
      val kept = r.main.agg(count(lit(1)).as("n"), round(sum(floor(col("value") * 100 + lit(0.5)).cast("long")) / 100.0, 4).as("total_value"))
        .select(lit("kept").as("bucket"), col("n"), col("total_value"))
      val dropped = r.dropped.get
        .agg(count(lit(1)).as("n"), round(sum(floor(col("value") * 100 + lit(0.5)).cast("long")) / 100.0, 4).as("total_value"))
        .select(lit("dropped").as("bucket"), col("n"), col("total_value"))
      kept.unionByName(dropped)
    },
    Some("""SELECT CASE WHEN value < 10 THEN 'dropped' ELSE 'kept' END AS bucket,
              count(*) AS n, round(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0, 4) AS total_value
            FROM events GROUP BY 1"""))

  /** Reject node: rejected rows carry state 'rejected'. */
  val qRejectSplit = Q(
    "q_reject_split",
    (s, dir) => {
      val ev = Tables(s, dir).events.withColumn("state", lit(Msg.PROCESSED))
      val r = Channel("rj").rejectWhen(col("event_type") === "error").run(ev)
      val rejected = CoreOps.markState(Msg.REJECTED)(r.rejected.get)
      Channel.merge(r.main, rejected)
        .groupBy(col("state")).agg(count(lit(1)).as("n"))
    },
    Some("""SELECT CASE WHEN event_type = 'error' THEN 'rejected'
                        ELSE 'processed' END AS state, count(*) AS n
            FROM events GROUP BY 1"""))

  /** Fail vs reject distinction (channels.py:80-81, 494-506): the FAIL
    * path (a node raises → fail_nodes → state `error`) is routed
    * separately from the REJECT path (explicit verdict → reject_nodes →
    * `rejected`), and ERROR outranks REJECTED in worst-state. failWhen
    * fires first, so a row matching both predicates lands in fails —
    * mirroring pypeman, where the raise preempts any later reject. */
  val qFailRoute = Q(
    "q_fail_route",
    (s, dir) => {
      val ev = Tables(s, dir).events.withColumn("state", lit(Msg.PROCESSED))
      val r = Channel("fl")
        .failWhen(col("value") > 90)
        .rejectWhen(col("event_type") === "error")
        .run(ev)
      val failed = CoreOps.markState(Msg.ERROR)(r.failedMsgs.get)
      val rejected = CoreOps.markState(Msg.REJECTED)(r.rejected.get)
      Channel.merge(r.main, rejected, failed)
        .groupBy(col("state")).agg(count(lit(1)).as("n"))
    },
    Some("""SELECT CASE WHEN value > 90 THEN 'error'
                        WHEN event_type = 'error' THEN 'rejected'
                        ELSE 'processed' END AS state, count(*) AS n
            FROM events GROUP BY 1"""))

  /** Worst-sub-state aggregation (msgstore.py:110). */
  val qWorstState = Q(
    "q_worst_state",
    (s, dir) => {
      val li = Tables(s, dir).lineitem.withColumn("state",
        when(col("l_returnflag") === "A", Msg.ERROR)
          .when(col("l_returnflag") === "R", Msg.REJECTED)
          .otherwise(Msg.PROCESSED))
      CoreOps.worstStatePerKey(Seq("l_orderkey"))(li)
        .groupBy(col("state")).agg(count(lit(1)).as("n_orders"))
    },
    Some("""SELECT state, count(*) AS n_orders FROM (
              SELECT l_orderkey,
                CASE max(CASE WHEN l_returnflag = 'A' THEN 5
                              WHEN l_returnflag = 'R' THEN 4 ELSE 3 END)
                  WHEN 5 THEN 'error' WHEN 4 THEN 'rejected'
                  ELSE 'processed' END AS state
              FROM lineitem GROUP BY l_orderkey)
            GROUP BY state"""))

  private def msgEvents(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir).events.select(
      col("event_id"),
      col("props").as("payload"),
      map(lit("et"), col("event_type")).as("meta"),
      map().cast(Msg.ctxType).as("ctx"))

  /** ctx save/restore roundtrip: setCtx → mutate payload+meta → useCtx. */
  val qCtxRoundtrip = Q(
    "q_ctx_roundtrip",
    (s, dir) => {
      Channel("ctx")
        .add(
          CoreOps.setCtx("orig"),
          CoreOps.mapPayload("shout")(upper),
          CoreOps.emptyMeta,
          CoreOps.useCtx("orig"))
        .runMain(msgEvents(s, dir))
        .select(col("event_id"), col("payload"), col("meta")("et").as("et"))
    },
    Some("SELECT event_id, props AS payload, event_type AS et FROM events"))

  /** CombineCtx: merge two saved contexts into one JSON payload. */
  val qCombineCtx = Q(
    "q_combine_ctx",
    (s, dir) => {
      Channel("cc")
        .add(
          CoreOps.setCtx("raw"),
          CoreOps.mapPayload("extractK")(p => get_json_object(p, "$.k")),
          CoreOps.setCtx("kctx"),
          CoreOps.combineCtx(Map("raw" -> "raw", "kctx" -> "kval")))
        .runMain(msgEvents(s, dir))
        .select(col("event_id"), col("payload"), col("meta")("et").as("et"))
    },
    Some("""SELECT event_id,
              to_json(struct_pack(raw := props,
                kval := json_extract_string(props, '$.k')))::VARCHAR AS payload,
              event_type AS et
            FROM events"""))

  /** YielderNode: 1 message → N messages via explode. */
  val qYielder = Q(
    "q_yielder",
    (s, dir) => {
      val docs = Tables(s, dir).documents.filter(col("doc_id") < 40)
      CoreOps.yielder(split(col("text"), " "), "token")(docs)
        .select(col("doc_id"), col("token"))
    },
    Some("""SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents WHERE doc_id < 40"""))

  /** FuncNode payload rewrite + Empty node null-payload handling. */
  val qFuncMap = Q(
    "q_func_map",
    (s, dir) => {
      val cust = Tables(s, dir).customer
        .select(col("c_custkey"), col("c_name").as("payload"),
          map().cast(MapType(StringType, StringType)).as("meta"))
      Channel("fn")
        .add(
          CoreOps.mapPayload("fmt")(p => concat(lower(p), lit("#"))),
          Node("withDefault")(df =>
            df.withColumn("payload", coalesce(col("payload"), lit("(empty)")))))
        .runMain(cust)
        .select(col("c_custkey"), col("payload"))
    },
    Some("SELECT c_custkey, concat(lower(c_name), '#') AS payload FROM customer"))

  /** Map node + MapItem/JoinMapItem field mapping. */
  val qMapRename = Q(
    "q_map_rename",
    (s, dir) => {
      CoreOps.mapFields(
        items = Seq(
          MapItem(old = "c_name", newName = "name"),
          MapItem(old = "c_acctbal", newName = "balance", transform = round(_, 2)),
          MapItem(newName = "source", default = "crm"),
          MapItem(old = "c_mktsegment", newName = "segment", transform = lower)),
        joins = Seq(JoinMapItem(Seq("c_name", "c_mktsegment"), "label", "/")))
        .apply(Tables(s, dir).customer)
    },
    Some("""SELECT c_name AS name, round(c_acctbal, 2) AS balance,
              'crm' AS source, lower(c_mktsegment) AS segment,
              concat_ws('/', c_name, c_mktsegment) AS label
            FROM customer"""))

  /** ToOrderedDict: ordered projection with defaults for missing keys. */
  val qToOrdered = Q(
    "q_to_ordered",
    (s, dir) => {
      CoreOps.project(
        Seq("p_partkey", "p_brand", "p_color"),
        defaults = Map("p_color" -> "none"))
        .apply(Tables(s, dir).part)
    },
    Some("SELECT p_partkey, p_brand, 'none' AS p_color FROM part"))

  /** Message JSON interchange round-trip (message.py:133 to_json / 171
    * from_json): build Msg rows with meta AND a ctx entry, serialize to the
    * reference's JSON layout, parse back, and surface every component —
    * uuid, µs-exact timestamp (as epoch ms), payload, meta value, ctx
    * payload. Any field the round-trip loses or garbles breaks the hash. */
  val qMsgJson = Q(
    "q_msg_json",
    (s, dir) => {
      val ev = Tables(s, dir).events
      val msgs = ev.select(
        md5(col("props")).as("uuid"),
        col("ts"),
        lit("application/text").as("content_type"),
        col("props").as("payload"),
        map(lit("et"), col("event_type")).as("meta"),
        lit(Msg.PENDING).as("state"),
        map(lit("orig"),
          struct(col("props").as("payload"),
            map(lit("et"), col("event_type")).as("meta")))
          .cast(Msg.ctxType).as("ctx"))
      Msg.fromJson(Msg.toJson(msgs))
        .select(
          col("uuid"),
          Msg.epochMs(col("ts")).as("ts_ms"),
          col("payload"),
          element_at(col("meta"), "et").as("et"),
          col("ctx")("orig").getField("payload").as("ctx_payload"))
    },
    Some("""SELECT md5(props) AS uuid, epoch_ms(ts) AS ts_ms, props AS payload,
              event_type AS et, props AS ctx_payload FROM events"""))

  def all: Seq[Q] = Seq(
    qMsgWrap, qChannelChain, qForkMerge, qWhen, qCaseRouting, qFilterDrop,
    qRejectSplit, qFailRoute, qWorstState, qCtxRoundtrip, qCombineCtx,
    qYielder, qFuncMap, qMapRename, qToOrdered, qMsgJson)
}
