package graft

import graft.api.{Admin, Channel, Channels, Events, Node}
import graft.ops.CoreOps
import graft.store.{MessageStore, Search}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class AdminSpec extends SparkSpec {
  import spark.implicits._

  test("registry + admin list/search/preview/replay + event bus") {
    Channels.clear(); Events.clear()
    val ch = Channels.register(
      Channel("upcase").add(CoreOps.mapPayload("up")(upper)))
    assert(Channels.get("upcase").isDefined)

    val admin = new Admin(spark)
    assert(admin.listChannels().exists { case (n, g) => n == "upcase" && g.contains("up") })

    val dir = Files.createTempDirectory("graft_admin").toString
    val store = new MessageStore(spark, s"$dir/msgs")
    store.save(Seq(("m1", "2024-01-01 10:00:00", "hello payload"))
      .toDF("uuid", "ts0", "payload")
      .withColumn("ts", col("ts0").cast("timestamp"))
      .withColumn("meta", map(lit("et"), lit("t")))
      .drop("ts0"))

    assert(admin.listMessages(store, Search(count = 10)).count() == 1)
    assert(admin.preview(store, Search(count = 10), 5)
      .select("preview").as[String].head() == "hello")

    var fired = Option.empty[String]
    Events.subscribe("replay")(p => fired = p.get("channel").map(_.toString))
    val replayed = admin.replay(store, Search(count = 10), "upcase")
    assert(replayed.select("payload").as[String].head() == "HELLO PAYLOAD")
    assert(fired.contains("upcase"))
  }
}
