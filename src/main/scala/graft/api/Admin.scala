package graft.api

import graft.store.{MessageStore, Search}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Channel registry + lifecycle events + admin facade.
  *
  * Mirrors the reference's module-level channel registry
  * (pypeman/channels.py `all_channels`), its event bus (pypeman/events.py)
  * and the data-plane operations of the remote-admin API
  * (pypeman/remoteadmin.py): list channels, inspect a channel's pipeline,
  * search/preview/replay stored messages. Process-management endpoints
  * (start/stop of a live asyncio loop) map to Structured Streaming query
  * lifecycle — `StreamingQuery.stop`/`start` — and are not re-wrapped here.
  */
object Channels {
  private var registry = Vector.empty[Channel]

  def register(c: Channel): Channel = synchronized { registry :+= c; c }
  def all: Seq[Channel] = registry
  def get(name: String): Option[Channel] = registry.find(_.name == name)
  def clear(): Unit = synchronized { registry = Vector.empty }
}

/** Minimal event bus (pypeman/events.py): named topics, sync listeners. */
object Events {
  type Listener = Map[String, Any] => Unit
  private var listeners = Map.empty[String, Vector[Listener]].withDefaultValue(Vector.empty)

  def subscribe(topic: String)(l: Listener): Unit =
    synchronized { listeners = listeners.updated(topic, listeners(topic) :+ l) }

  def emit(topic: String, payload: Map[String, Any]): Unit =
    listeners(topic).foreach(_(payload))

  def clear(): Unit = synchronized { listeners = listeners.empty }
}

final class Admin(spark: SparkSession) {

  /** remoteadmin `list_channels`. */
  def listChannels(): Seq[(String, String)] =
    Channels.all.map(c => c.name -> c.graph())

  /** remoteadmin `list_msgs` over a channel's store. */
  def listMessages(store: MessageStore, q: Search): DataFrame = store.search(q)

  /** remoteadmin `view_msg` preview. */
  def preview(store: MessageStore, q: Search, n: Int = 1000): DataFrame =
    store.search(q).select(
      org.apache.spark.sql.functions.col("uuid"),
      MessageStore.preview(org.apache.spark.sql.functions.col("payload"), n).as("preview"))

  /** remoteadmin `replay_msg`. */
  def replay(store: MessageStore, q: Search, channelName: String): DataFrame = {
    val ch = Channels.get(channelName)
      .getOrElse(throw new NoSuchElementException(s"channel $channelName not registered"))
    Events.emit("replay", Map("channel" -> channelName))
    store.replay(q, ch)
  }
}
