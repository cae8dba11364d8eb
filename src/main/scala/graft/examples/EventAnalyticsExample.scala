package graft.examples

import graft.ops.{Audit, Cdc}
import graft.streaming.Sessionize
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end event analytics over a raw event log — the round-5 operator
  * wave composed the way a product-analytics job would run it nightly:
  *
  *   1. AUDIT the batch (null/range/set/uniqueness rules) and abort on
  *      failure — bad batches must not poison downstream tables;
  *   2. COMPACT the log CDC-style to the latest state per (user, type);
  *   3. SESSIONIZE (30-min gap) and derive per-user engagement;
  *   4. FUNNEL + weekly COHORT retention for the product report.
  *
  * Every stage is declarative DataFrame algebra: one audit scan, one
  * compaction shuffle, one sessionization shuffle, funnel joins on the
  * uniform user_id key — the whole report is a handful of bounded
  * shuffles at any corpus size.
  */
object EventAnalyticsExample {

  final case class Report(
      auditPassed: Boolean,
      nLatestKeys: Long,
      nSessions: Long,
      funnel: Seq[(String, Long)],
      cohortWeeks: Long)

  def audit(events: DataFrame): DataFrame =
    Audit.audit(events,
      rowChecks = Seq(
        "value_not_null" -> col("value").isNull,
        "value_nonneg" -> (col("value") < 0),
        "type_known" -> !col("event_type")
          .isin("click", "view", "purchase", "error", "signup")),
      uniqueCols = Seq("event_id"))

  def sessions(events: DataFrame): DataFrame =
    Sessionize.batchSessions(
      events.select(col("user_id"),
        unix_seconds(col("ts").cast("timestamp")).as("ts_s")),
      "user_id", "ts_s", gapS = 1800L)

  def funnel(events: DataFrame): Seq[(String, Long)] = {
    val v = events.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = events.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val p = events.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    Seq("view" -> v.count(), "click" -> c.count(), "purchase" -> p.count())
  }

  /** Run the nightly report; aborts (None) when the audit fails. */
  def run(spark: SparkSession, sfDir: String): Option[Report] = {
    val events = graft.Tables(spark, sfDir).events
    val verdicts = audit(events)
    val passed = verdicts.agg(min(col("passed"))).collect()(0).getBoolean(0)
    if (!passed) return None
    val latest = Cdc.latestSnapshot(
      events.withColumn("us", graft.model.Msg.epochUs(col("ts"))),
      keyCols = Seq("user_id", "event_type"),
      versionCols = Seq("us", "event_id"),
      payloadCols = Seq("value"))
    val ses = sessions(events)
    val cohorts = {
      val first = events.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).as("cw"))
      events.join(first, "user_id")
        .select(col("cw")).distinct()
    }
    Some(Report(
      auditPassed = passed,
      nLatestKeys = latest.count(),
      nSessions = ses.count(),
      funnel = funnel(events),
      cohortWeeks = cohorts.count()))
  }
}
