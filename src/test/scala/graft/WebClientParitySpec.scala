package graft

import graft.api.{Channel, Channels, RemoteAdmin}
import graft.model.Msg
import graft.ops.CoreOps
import graft.store.MessageStore
import org.apache.spark.sql.functions._
import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.Files

/** Web-client parity: the reference ships a Vue admin SPA
  * (pypeman/client/) that drives the remote-admin RPC. This spec sends the
  * LITERAL JSON-RPC request bodies that client's components produce and
  * asserts exactly the response fields their `.then` handlers read —
  * so a user pointing the reference web UI at graft's admin socket gets a
  * working console.
  *
  * Call-shape sources:
  *  - Channels.vue:24          `channels` []
  *  - ChannelList.vue:52       `{start|stop}_channel` [name] → result.status
  *  - MessageStore.vue:71-83   `list_msgs` [chan, start, rowsPerPage,
  *                             (descending ? '' : '-') + sortBy] →
  *                             {messages: [{timestamp,id,state}], total}
  *  - MessageStore.vue:86-104  `replay_msg` [chan, [ids]] → ARRAY of msg
  *                             dicts, failures flagged by an `error` key
  */
class WebClientParitySpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  private def rpc(admin: RemoteAdmin, method: String, params: String) = {
    val resp = admin.dispatch(
      s"""{"jsonrpc":"2.0","method":"$method","params":$params,"id":7}""")
    mapper.readTree(resp).get("result")
  }

  private def adminWithStore(): RemoteAdmin = {
    Channels.clear()
    Channels.register(Channel("chan1").add(CoreOps.mapPayload("up")(upper)))
    val dir = Files.createTempDirectory("graft_webclient").toString
    val store = new MessageStore(spark, s"$dir/msgs")
    store.save(Seq(
      ("m1", "2024-01-01 10:00:00.000000", "first", "processed"),
      ("m2", "2024-01-02 11:00:00.000000", "second", "error"),
      ("m3", "2024-01-03 12:00:00.000000", "third", "pending"))
      .toDF("uuid", "ts0", "payload", "state")
      .withColumn("ts", col("ts0").cast("timestamp")).drop("ts0")
      .withColumn("meta", map().cast("map<string,string>"))
      .withColumn("ctx", map().cast(Msg.ctxType)))
    val admin = new RemoteAdmin(spark)
    admin.bind("chan1", store)
    admin
  }

  test("Channels.vue: channels [] → list with name/status/has_message_store/subchannels") {
    val admin = adminWithStore()
    val r = rpc(admin, "channels", "[]")
    assert(r.isArray && r.size() == 1)
    val c = r.get(0)
    assert(c.get("name").asText() == "chan1")
    assert(c.get("status").isTextual)
    assert(c.get("has_message_store").asBoolean())
    assert(c.get("subchannels").isArray) // template reads .length
  }

  test("ChannelList.vue: start_channel/stop_channel [name] → result.status") {
    val admin = adminWithStore()
    assert(rpc(admin, "start_channel", """["chan1"]""").get("status").asText() == "WAITING")
    assert(rpc(admin, "stop_channel", """["chan1"]""").get("status").asText() == "STOPPED")
  }

  test("MessageStore.vue: list_msgs with the client's ascending form '-timestamp'") {
    val admin = adminWithStore()
    // descending=false → '-' prefix (MessageStore.vue:77); reference
    // msgstore.py:490 treats '-' as reverse, so '-timestamp' = newest first
    val r = rpc(admin, "list_msgs", """["chan1", 0, 10, "-timestamp"]""")
    assert(r.get("total").asLong() == 3L)
    val ids = (0 until r.get("messages").size()).map(r.get("messages").get(_).get("id").asText())
    assert(ids == Seq("m3", "m2", "m1"))
    val m = r.get("messages").get(0)
    assert(m.get("timestamp").isTextual && m.get("state").asText() == "pending")
  }

  test("MessageStore.vue: list_msgs default descending=true form 'timestamp' and paging") {
    val admin = adminWithStore()
    val r = rpc(admin, "list_msgs", """["chan1", 1, 1, "timestamp"]""")
    assert(r.get("total").asLong() == 3L)
    assert(r.get("messages").size() == 1)
    assert(r.get("messages").get(0).get("id").asText() == "m2")
    // sort by the id column header (value: 'id'), reversed
    val byId = rpc(admin, "list_msgs", """["chan1", 0, 10, "-id"]""")
    assert(byId.get("messages").get(0).get("id").asText() == "m3")
  }

  test("MessageStore.vue: replay_msg [chan, [ids]] → array, per-item error keys") {
    val admin = adminWithStore()
    val ok = rpc(admin, "replay_msg", """["chan1", ["m1"]]""")
    assert(ok.isArray && ok.size() == 1)
    assert(!ok.get(0).has("error")) // success counted via hasOwnProperty('error')
    assert(ok.get(0).get("payload").asText() == "FIRST") // channel ran
    val mixed = rpc(admin, "replay_msg", """["chan1", ["m2", "nope"]]""")
    assert(mixed.size() == 2)
    assert(!mixed.get(0).has("error") && mixed.get(1).has("error"))
    // shell-client single-id form still served (remoteadmin.py:318-328)
    val single = rpc(admin, "replay_msg", """["chan1", "m1"]""")
    assert(single.isObject && !single.has("error"))
  }
}
