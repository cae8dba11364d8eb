package graft.store

import graft.api.Channel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** In-memory message store (reference: msgstore.py:424 MemoryMessageStore)
  * — same search/total/replay surface as the parquet store, state held as
  * materialized DataFrames in the driver. Exists for the same reason the
  * reference's does: fast tests and ephemeral channels; durable stores use
  * [[MessageStore]] (parquet). Messages are localCheckpoint'd on save so
  * the store owns its data (caller plans can be unpersisted freely).
  *
  * `changeMessageState` mirrors msgstore.py change_message_state — a
  * column rewrite, cheap here; the parquet store implements the same
  * surface as an append-only mutation log reconciled at read time (see
  * [[MessageStore]]).
  */
final class MemoryMessageStore(spark: SparkSession) {

  private var msgs: Option[DataFrame] = None

  def save(df: DataFrame): Unit = synchronized {
    val owned = df.localCheckpoint(true)
    msgs = Some(msgs.fold(owned)(_.unionByName(owned, allowMissingColumns = true)))
  }

  def all(): DataFrame =
    msgs.getOrElse(throw new NoSuchElementException("memory store is empty"))

  def isEmpty: Boolean = msgs.isEmpty

  def search(q: Search): DataFrame = MessageStore.search(all(), q)

  def total(): Long = msgs.fold(0L)(_.count())

  /** msgstore.py change_message_state: set one message's state. */
  def changeMessageState(uuid: String, newState: String): Unit = synchronized {
    msgs = msgs.map(_.withColumn("state",
      when(col("uuid") === uuid, lit(newState)).otherwise(col("state")))
      .localCheckpoint(true))
  }

  /** delete (msgstore.py:354): drop a message by id. */
  def delete(uuid: String): Unit = synchronized {
    msgs = msgs.map(_.filter(col("uuid") =!= uuid).localCheckpoint(true))
  }

  /** Replay with reference handle()-flow parity: results renewed (fresh
    * uuid + timestamp, message.py:80) and saved back as processed — the
    * same [[MessageStore.renewProcessed]] the durable store's replay uses. */
  def replay(q: Search, channel: Channel): DataFrame = {
    val renewed = MessageStore
      .renewProcessed(channel.runMain(search(q)), System.nanoTime())
      .localCheckpoint(true)
    save(renewed)
    renewed
  }
}
