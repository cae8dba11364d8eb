package graft.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Retry machinery — graft's `RetryFileMsgStore` (reference:
  * pypeman/retry.py). The reference parks a failed message in a per-channel
  * file store and periodically re-sends in arrival order; graft models the
  * parked set as a DataFrame with an attempt counter and an exponential
  * backoff schedule, so "which messages are due" is a filter, and "re-emit
  * in order" is an ordered scan — both pushdown-friendly.
  */
object RetryStore {

  /** Annotate parked rows with their attempt number (per key, in time
    * order) and the backoff-scheduled next-try time:
    * next_try = ts + base * 2^attempt (capped at maxBackoffSec). */
  def schedule(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      orderCol: String,
      baseSec: Int = 1,
      maxBackoffSec: Long = 3600): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(orderCol))
    df.withColumn("attempt", row_number().over(w).cast("long"))
      .withColumn("backoff_sec",
        least((lit(baseSec) * pow(lit(2.0), least(col("attempt"), lit(30)))).cast("long"),
          lit(maxBackoffSec)))
      .withColumn("next_try_ms",
        graft.model.Msg.epochMs(col(tsCol)) + col("backoff_sec") * 1000L)
  }

  /** Rows due for retry at `nowMs`, in the reference's first-in-first-out
    * re-send order. */
  def due(scheduled: DataFrame, nowMs: Long, tsCol: String, orderCol: String): DataFrame =
    scheduled.filter(col("next_try_ms") <= nowMs)
      .orderBy(col(tsCol), col(orderCol))

  /** Re-park rows that failed another attempt: backoff derives from the
    * EXISTING `attempt` counter (maintained by RetryDriver), next try is
    * `nowMs` + backoff — the re-wait of retry.py:238. */
  def reschedule(
      df: DataFrame,
      nowMs: Long,
      baseSec: Int = 1,
      maxBackoffSec: Long = 3600): DataFrame =
    df.withColumn("backoff_sec",
        least((lit(baseSec) * pow(lit(2.0), least(col("attempt"), lit(30)))).cast("long"),
          lit(maxBackoffSec)))
      .withColumn("next_try_ms", lit(nowMs) + col("backoff_sec") * 1000L)
}
