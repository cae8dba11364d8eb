package graft

import graft.examples.EventAnalyticsExample
import org.apache.spark.sql.functions._

class EventAnalyticsExampleSpec extends SparkSpec {
  import spark.implicits._

  test("nightly report runs end-to-end on clean data") {
    val r = EventAnalyticsExample.run(spark, sf)
    assert(r.isDefined)
    val report = r.get
    assert(report.auditPassed)
    assert(report.nSessions > 0 && report.nLatestKeys > 0 && report.cohortWeeks > 0)
    // funnel stages shrink monotonically
    val counts = report.funnel.map(_._2)
    assert(counts == counts.sorted.reverse)
  }

  test("a failing audit aborts the report") {
    // poison the batch: a negative value fails the value_nonneg rule
    val events = Tables(spark, sf).events
      .withColumn("value", when(col("event_id") === 0, lit(-1.0)).otherwise(col("value")))
    val verdicts = EventAnalyticsExample.audit(events)
      .as[(String, Long, Long, Boolean)].collect().map(r => r._1 -> r._4).toMap
    assert(!verdicts("value_nonneg"))
    assert(verdicts("value_not_null")) // the other checks still pass
  }
}
