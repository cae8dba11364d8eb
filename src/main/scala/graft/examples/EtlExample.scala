package graft.examples

import graft.api.{Channel, Channels, Node, Nodes}
import graft.ops.CoreOps
import graft.store.{MessageStore, Search}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A complete example app — the graft equivalent of the reference's
  * example project (pypeman tests/test_app/project.py): ingest JSON event
  * messages, validate, route by kind, enrich, persist to a searchable
  * store, and expose replay.
  *
  * Everything is declarative: the channel below runs unchanged on a batch
  * DataFrame (as here) or a `readStream` source.
  */
object EtlExample {

  val payloadSchema: StructType = StructType(Seq(StructField("k", IntegerType)))

  /** The channel definition — the part a pypeman user would recognize. */
  def pipeline: Channel = Channels.register(
    Channel("events_etl")
      // parse + validate: malformed payloads are rejected (fail_nodes)
      .add(Nodes.JsonToPython(payloadSchema))
      .rejectWhen(col("payload").isNull)
      // route: errors forked to an alert branch, main flow continues
      .fork("alerts") {
        _.add(Node("errorsOnly")(_.filter(col("meta")("event_type") === "error")))
      }
      // enrich: k-bucket + quality-style tagging, back to JSON text
      .add(
        Node("enrich")(_.withColumn("meta",
          map_concat(col("meta"), map(lit("k_bucket"),
            when(col("payload")("k") < 50, "low").otherwise("high"))))),
        Nodes.PythonToJson(),
        CoreOps.markState(graft.model.Msg.PROCESSED)))

  /** Wire the pipeline to the test events table and a store. */
  def run(spark: SparkSession, sfDir: String, storePath: String): DataFrame = {
    val msgs = graft.Tables(spark, sfDir).events.select(
      col("event_id").cast("string").as("uuid"),
      col("ts"),
      col("props").as("payload"),
      map(lit("event_type"), col("event_type")).as("meta"),
      lit(graft.model.Msg.PENDING).as("state"))
    val result = pipeline.run(msgs)
    val store = new MessageStore(spark, storePath)
    store.save(result.main)
    result.main
  }

  /** Operational queries an admin would run afterwards. */
  def recentHighK(spark: SparkSession, storePath: String): DataFrame =
    new MessageStore(spark, storePath).search(Search(
      metaExact = Map("k_bucket" -> "high"),
      count = 20))
}
