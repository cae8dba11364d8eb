package graft

import graft.model.Msg
import org.apache.spark.sql.functions._

/** Message JSON interchange parity (message.py:103-178): the exact
  * to_dict/to_json layout, from_json on reference-authored payloads, and
  * copy/renew semantics. */
class MsgJsonSpec extends SparkSpec {
  import spark.implicits._

  private def oneMsg = Seq(("u1", "hello")).toDF("uuid", "payload")
    .withColumn("ts", lit("2024-01-01 10:00:00.123456").cast("timestamp"))
    .withColumn("content_type", lit("application/text"))
    .withColumn("meta", map(lit("a"), lit("b")))
    .withColumn("state", lit(Msg.PENDING))
    .withColumn("ctx", map(lit("k"),
      struct(lit("p").as("payload"), map(lit("m"), lit("v")).as("meta")))
      .cast(Msg.ctxType))

  test("toJson emits the reference to_dict layout: field order, µs timestamp, explicit nulls") {
    val js = Msg.toJson(oneMsg).as[String].head()
    assert(js ==
      """{"timestamp":"2024-01-01T10:00:00.123456Z","uuid":"u1",""" +
        """"store_id":null,"store_chan_name":null,"payload":"hello",""" +
        """"meta":{"a":"b"},"ctx":{"k":{"payload":"p","meta":{"m":"v"}}}}""")
  }

  test("fromJson parses a pypeman-authored message (encode_payload=False layout)") {
    // hand-written exactly as message.py to_json would dump it
    val pypemanJson =
      """{"timestamp": "2023-06-15T08:30:45.000250Z", "uuid": "abcd1234",""" +
        """ "store_id": null, "store_chan_name": null, "payload": "raw body",""" +
        """ "meta": {"status": "ok"}, "ctx": {"orig": {"payload": "before", "meta": {}}}}"""
    val m = Msg.fromJson(Seq(pypemanJson).toDF("json"))
    val row = m.select(
      $"uuid", date_format($"ts", Msg.jsonTsFormat), $"payload",
      $"meta"("status"), $"ctx"("orig").getField("payload"), $"state")
      .as[(String, String, String, String, String, String)].head()
    assert(row == (("abcd1234", "2023-06-15T08:30:45.000250Z", "raw body",
      "ok", "before", Msg.PENDING)))
  }

  test("toJson → fromJson round-trip is lossless for every component") {
    val back = Msg.fromJson(Msg.toJson(oneMsg))
    val row = back.select(
      $"uuid", date_format($"ts", Msg.jsonTsFormat), $"payload",
      $"meta"("a"), $"ctx"("k").getField("payload"),
      $"ctx"("k").getField("meta")("m"))
      .as[(String, String, String, String, String, String)].head()
    assert(row == (("u1", "2024-01-01T10:00:00.123456Z", "hello", "b", "p", "v")))
  }

  test("copy is identity; renew re-keys deterministically and refreshes ts") {
    val src = oneMsg
    assert(Msg.copy(src) eq src) // immutable rows: copy is the identity
    val renewed = Msg.renew(oneMsg)
    val (oldU, newU) = (oneMsg.select("uuid").as[String].head(),
      renewed.select("uuid").as[String].head())
    assert(newU != oldU && newU.length == 32)
    // deterministic: renewing the same message twice yields the same uuid
    assert(Msg.renew(oneMsg).select("uuid").as[String].head() == newU)
  }
}
