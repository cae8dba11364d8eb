package graft.examples

import graft.ops.HeavyHitters
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operational incident triage over a raw event log — this session's
  * robust-stats + sketch wave composed the way an on-call analytics job
  * runs it:
  *
  *   1. ANOMALIES: rolling z-score per user (trailing-20 mean/stddev,
  *      one window sort) flags outlier readings;
  *   2. HOT KEYS: Misra–Gries candidates + exact recount find the value
  *      buckets dominating the batch (the hot-partition detector);
  *   3. ERROR PATHS: the first-order transition matrix restricted to
  *      rows entering an `error` event — which states feed failures;
  *   4. STATE HISTORY: SCD2 validity intervals so each incident can be
  *      joined back to "what was the user's state AT THAT TIME" with the
  *      native as-of join.
  *
  * Scale shape: every stage is a bounded-shuffle pass over the (cached)
  * batch — stages 1, 3 and 4 each run one user_id window sort, stage 2
  * ships k counters per partition + a broadcast recount. Nothing in the
  * report holds driver-side data beyond the heavy-hitter candidate set
  * (≤ k rows).
  */
object IncidentOpsExample {

  final case class Report(
      nAnomalies: Long,
      hotBuckets: Seq[(Long, Long)],
      topErrorFeeder: String,
      nOpenStates: Long)

  def anomalies(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-19, Window.currentRow)
    events
      .withColumn("mu", avg(col("value")).over(w))
      .withColumn("sd", stddev_samp(col("value")).over(w))
      .withColumn("z", round((col("value") - col("mu")) / col("sd"), 4))
      .filter(col("sd") > 0 && abs(col("z")) > 2.5)
      .select(col("user_id"), col("event_id"), col("ts"), col("z"))
  }

  def hotBuckets(events: DataFrame, phi: Double): DataFrame =
    HeavyHitters.exact(
      events.select(floor(col("value")).cast("long").as("vkey")), "vkey", phi)

  /** Transition counts INTO error states: which event types precede a
    * failure, normalized per source type. */
  def errorFeeders(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type") === "error")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_into_error"))
  }

  def stateHistory(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("valid_from", graft.model.Msg.epochUs(col("ts")))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("value"), col("valid_from"),
        coalesce(graft.model.Msg.epochUs(col("next_ts")), lit(-1L)).as("valid_to"))
  }

  /** Enrich each anomaly with the state valid AT its time via the native
    * as-of join (the history row opening at-or-before the anomaly).
    * Equal-valid_from ties (duplicate timestamps) break on EVENT ORDER —
    * a valid_to tiebreak would invert at the stream tail, where the open
    * interval's -1 sentinel sorts below a superseded zero-length one. */
  def anomaliesWithState(events: DataFrame): DataFrame = {
    val an = anomalies(events)
      .withColumn("at_us", graft.model.Msg.epochUs(col("ts"))).drop("ts")
    val hist = stateHistory(events)
    graft.plans.AsOf.joinBackward(
      an, hist, key = "user_id",
      leftTimeCol = "at_us", rightTimeCol = "valid_from",
      tiebreak = "event_id")
  }

  def run(spark: SparkSession, sfDir: String): Report = {
    // the four stages are independent actions over the same batch —
    // cache it once so each pays its own shuffle but not its own scan
    val events = graft.Tables(spark, sfDir).events.cache()
    try {
      runOn(events)
    } finally events.unpersist()
  }

  private def runOn(events: DataFrame): Report = {
    val hot = hotBuckets(events, phi = 0.01)
      .orderBy(col("cnt").desc, col("vkey")).limit(5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val feeder = errorFeeders(events)
      .orderBy(col("n_into_error").desc, col("event_type")).limit(1)
      .collect().headOption.map(_.getString(0)).getOrElse("none")
    Report(
      nAnomalies = anomalies(events).count(),
      hotBuckets = hot,
      topErrorFeeder = feeder,
      nOpenStates = stateHistory(events).filter(col("valid_to") === -1L).count())
  }
}
