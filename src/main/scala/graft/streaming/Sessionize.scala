package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based sessionization with
  * `flatMapGroupsWithState` — the Structured-Streaming form of per-key
  * mutable state (what the reference keeps in its persistence backends,
  * here checkpointed and partition-parallel).
  *
  * Streaming semantics: the open session is HELD IN STATE across
  * micro-batches and emitted only when (a) a later event for the key
  * arrives past the gap, or (b) the event-time watermark passes
  * `last + gap` and the state times out (`EventTimeTimeout`). A session
  * spanning two micro-batches is therefore emitted exactly once. Batch
  * datasets see every event for a key in one invocation, so the trailing
  * open session is flushed at group end instead (timeouts never fire in
  * batch mode).
  */
object Sessionize {

  /** Declarative batch sessionization (gaps-and-islands): a session
    * boundary opens wherever a key's gap to the previous event exceeds
    * `gapS`; the running sum of boundary flags is the session number and
    * a plain groupBy collapses each island. Same semantics as
    * [[sessions]]' stateful form (a spec asserts agreement) but fully
    * relational — Catalyst sees through it, and the window's
    * hash-partitioning on the key already satisfies the final
    * (key, session) grouping, so the whole operator is ONE shuffle:
    * exchange on key → sort → lag/sum window → partial agg. At 100 TB
    * that is the floor for an order-dependent per-key computation.
    *
    * `tsCol` must be numeric seconds (cast timestamps up front). Output:
    * one row per session — key, session_start, session_end, n_events. */
  def batchSessions(
      events: org.apache.spark.sql.DataFrame,
      keyCol: String,
      tsCol: String,
      gapS: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val boundary = when(
      col(tsCol) - lag(col(tsCol), 1).over(w) <= gapS, lit(0)).otherwise(lit(1))
    events
      .withColumn("__sess", sum(boundary).over(
        Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__sess"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("__sess")
  }

  final case class Event(userId: Long, tsMs: Long, eventType: String)
  final case class SessionState(start: Long, last: Long, n: Int)
  final case class Session(userId: Long, startMs: Long, endMs: Long, nEvents: Int)

  /** Attach an event-time column + watermark to a raw event stream so the
    * EventTimeTimeout path can fire. `delay` is the allowed lateness. */
  def withEventTimeWatermark(events: DataFrame, delay: String = "0 seconds"): Dataset[Event] = {
    implicit val ee = Encoders.product[Event]
    events
      .withColumn("eventTime", timestamp_millis(col("tsMs")))
      .withWatermark("eventTime", delay)
      .as[Event]
  }

  /** Emit a session whenever a user's gap exceeds `gapMs`. Works on a
    * streaming Dataset (event-time state held across micro-batches,
    * timeout-driven flush — callers must set a watermark, see
    * [[withEventTimeWatermark]]) and on a batch Dataset (final flush at
    * group end). */
  def sessions(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    implicit val se = Encoders.product[Session]
    implicit val ss = Encoders.product[SessionState]
    val streaming = events.isStreaming
    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.userId)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](OutputMode.Append, timeout) {
        case (userId, evs, state: GroupState[SessionState]) =>
          if (streaming && state.hasTimedOut) {
            // watermark passed last+gap with no newer events: close it
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.last, s.n))
          } else {
            // flatMapGroupsWithState does NOT drop late rows by itself: an
            // event older than the watermark, arriving after its session
            // was already closed by EventTimeTimeout, would open a spurious
            // overlapping session (duplicate emission for the same
            // activity). Apply the same discard semantics windowed aggs
            // have — drop events below the current watermark.
            val wm = if (streaming) state.getCurrentWatermarkMs() else Long.MinValue
            val sorted = evs.toSeq.filter(_.tsMs >= wm).sortBy(_.tsMs)
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
            if (streaming) {
              // keep the open session; wake up when the watermark passes
              // its gap horizon (clamped above the current watermark, for
              // keys whose last event is already late)
              cur.foreach { s =>
                state.update(s)
                state.setTimeoutTimestamp(
                  math.max(s.last + gapMs, state.getCurrentWatermarkMs() + 1))
              }
            } else {
              cur.foreach { s => out += Session(userId, s.start, s.last, s.n) }
              if (state.exists) state.remove()
            }
            out.iterator
          }
      }
  }
}
