package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming windowed heavy hitters — Misra–Gries summaries held in
  * per-window `GroupState`, flushed when the event-time watermark closes
  * the window. The streaming twin of the batch pair
  * `plans.MgSketch` + `ops.HeavyHitters.exact`:
  *
  *   - state per open window is ONE bounded array of ≤ `k` (key, count)
  *     counters — memory tracks k × open-windows, never the key
  *     cardinality (the reason a plain windowed `groupBy(key).count`
  *     can't serve a hot-key dashboard over a 10⁹-key stream: its state
  *     IS the key set);
  *   - the MG guarantee carries over per window: any key with true count
  *     > n/(k+1) inside the window survives, and each reported count is
  *     an underestimate by at most the window's total decrement.
  *
  * Emission: `EventTimeTimeout` fires once the watermark passes
  * window_end + allowed lateness; the window's surviving counters emit
  * as (window_start, key, min_count) and the state is removed —
  * append-mode-clean, exactly-once under checkpoint recovery (the
  * StreamRecoverySpec pattern). In BATCH mode every group sees all its
  * rows at once: the summary flushes at group end, which makes the
  * operator spec-testable without a streaming harness.
  */
object HeavyHittersStream {

  final case class Keyed(windowStart: Long, key: String)
  final case class Hit(windowStart: Long, key: String, minCount: Long)

  /** Misra–Gries update over a bounded counter map. */
  private[streaming] def mgUpdate(
      counters: Map[String, Long], key: String, k: Int): Map[String, Long] =
    if (counters.contains(key)) counters.updated(key, counters(key) + 1)
    else if (counters.size < k) counters.updated(key, 1L)
    else {
      // decrement-all step; drop zeroed counters
      counters.flatMap { case (c, n) =>
        if (n > 1) Some(c -> (n - 1)) else None
      }
    }

  /** Per-window MG top candidates over a stream (or batch) of
    * (eventTime: timestamp, key: string) rows. `windowSec` buckets event
    * time; `k` bounds counters per window; `delay` is the allowed
    * lateness — the watermark rides the DERIVED event-time column,
    * because one set on the raw input column does not survive the
    * cast/rename into this operator's projection (observed as an
    * "Event-time timeout not supported without watermark" analysis
    * error). */
  def windowedHeavyHitters(
      df: DataFrame, timeCol: String, keyCol: String,
      windowSec: Long, k: Int, delay: String = "0 seconds"): Dataset[Hit] = {
    require(windowSec >= 1 && k >= 1, "bad windowedHeavyHitters params")
    implicit val he = Encoders.product[Hit]
    implicit val ke = Encoders.product[Keyed]
    implicit val se = Encoders.kryo[Map[String, Long]]
    val streaming = df.isStreaming
    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val keyed = df.select(
      (floor(unix_millis(col(timeCol).cast("timestamp")).cast("double")
        / (windowSec * 1000)).cast("long") * windowSec * 1000)
        .as("windowStart"),
      col(keyCol).cast("string").as("key"),
      col(timeCol).cast("timestamp").as("eventTime"))
      .as[(Long, String, java.sql.Timestamp)](
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
          Encoders.TIMESTAMP))
    val withWm =
      if (streaming) keyed.withWatermark("eventTime", delay) else keyed
    withWm
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[Map[String, Long], Hit](
        OutputMode.Append, timeout) {
        case (windowStart, rows, state: GroupState[Map[String, Long]]) =>
          if (streaming && state.hasTimedOut) {
            val counters = state.getOption.getOrElse(Map.empty)
            state.remove()
            counters.toSeq.sortBy { case (c, n) => (-n, c) }.iterator
              .map { case (c, n) => Hit(windowStart, c, n) }
          } else {
            var counters = state.getOption.getOrElse(Map.empty)
            rows.foreach { r => counters = mgUpdate(counters, r._2, k) }
            if (streaming) {
              state.update(counters)
              // flush when the watermark passes the window end; a late
              // recreation of an already-closed window must not set a
              // timeout at-or-below the current watermark (illegal) —
              // clamp to watermark+1 so it flushes next batch instead
              state.setTimeoutTimestamp(math.max(
                windowStart + windowSec * 1000,
                state.getCurrentWatermarkMs() + 1))
              Iterator.empty
            } else {
              // batch: the group is complete — flush now
              counters.toSeq.sortBy { case (c, n) => (-n, c) }.iterator
                .map { case (c, n) => Hit(windowStart, c, n) }
            }
          }
      }
  }
}
