package graft

import graft.api.Settings
import graft.model.Msg
import graft.net.HttpEndpoint
import graft.store.MessageStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** pypeman-tools parity (tool_commands.py + pypeman/tools/): `viewstore`
  * (view_store.py — read and payload-filter a store) and `sendfromstore`
  * (send_from_store.py — POST matching entries to an endpoint), both as
  * `graft.Main` subcommands over the columnar MessageStore, the send
  * driven against a LIVE in-process HTTP endpoint. */
class MainToolsSpec extends SparkSpec {
  import spark.implicits._

  private def mkStore(): String = {
    val dir = Files.createTempDirectory("graft_tools").toString
    val store = new MessageStore(spark, s"$dir/msgs")
    store.save(Seq(
      ("m1", "2024-01-01 10:00:00", """{"kind":"a","n":1}""", "processed"),
      ("m2", "2024-01-02 11:00:00", """{"kind":"b","n":2}""", "processed"),
      ("m3", "2024-01-03 12:00:00", """{"kind":"a","n":3}""", "error"))
      .toDF("uuid", "ts0", "payload", "state")
      .withColumn("ts", col("ts0").cast("timestamp")).drop("ts0")
      .withColumn("meta", map().cast("map<string,string>"))
      .withColumn("ctx", map().cast(Msg.ctxType)))
    s"$dir/msgs"
  }

  private def run(args: String*): Seq[String] =
    Main.run(args.toSeq, Settings.load(), () => spark)
      .fold(err => fail(s"command failed: $err"), identity)

  test("viewstore: prints id + payload for every entry, store order") {
    val path = mkStore()
    val lines = run("viewstore", path)
    assert(lines == Seq(
      """m1 {"kind":"a","n":1}""",
      """m2 {"kind":"b","n":2}""",
      """m3 {"kind":"a","n":3}"""))
  }

  test("viewstore: --filter name=value payload equality, quoted and numeric forms") {
    val path = mkStore()
    // string filter, shell-quoted like the reference's literal_eval input
    assert(run("viewstore", path, "--filter", "kind='a'")
      .map(_.takeWhile(_ != ' ')) == Seq("m1", "m3"))
    // numeric filter, unquoted; -f alias; filters AND-compose
    assert(run("viewstore", path, "-f", "n=2").map(_.takeWhile(_ != ' ')) == Seq("m2"))
    assert(run("viewstore", path, "-f", "kind='a'", "-f", "n=3")
      .map(_.takeWhile(_ != ' ')) == Seq("m3"))
  }

  test("sendfromstore: POSTs filtered payloads to a live endpoint, reports status") {
    val path = mkStore()
    val ep = new HttpEndpoint(spark)
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    ep.addHandler("/sink") { body => seen.synchronized { seen += body }; "ok" }
    ep.start()
    try {
      val lines = run("sendfromstore", path, "-f", "kind='a'",
        "--destination", ep.url("/sink"))
      assert(lines == Seq(
        s"send m1 to ${ep.url("/sink")} [200]",
        s"send m3 to ${ep.url("/sink")} [200]"))
      val bodies = seen.synchronized(seen.sorted.toSeq)
      assert(bodies == Seq("""{"kind":"a","n":1}""", """{"kind":"a","n":3}"""))
    } finally ep.stop()
  }

  test("unknown tool command is still rejected with the full command list") {
    val err = Main.run(Seq("bogus"), Settings.load(), () => spark)
    assert(err.isLeft && err.left.exists(_.contains("viewstore")))
  }

  test("malformed --filter yields a usage error, not a stack trace") {
    val path = mkStore()
    val err = Main.run(Seq("viewstore", path, "-f", "kind"), Settings.load(), () => spark)
    assert(err == Left("bad --filter 'kind'; expected name=value"))
  }
}
