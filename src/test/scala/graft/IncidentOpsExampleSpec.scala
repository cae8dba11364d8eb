package graft

import graft.examples.IncidentOpsExample
import org.apache.spark.sql.functions._

class IncidentOpsExampleSpec extends SparkSpec {
  import spark.implicits._

  test("incident report runs end-to-end with coherent stages") {
    val r = IncidentOpsExample.run(spark, sf)
    assert(r.nAnomalies > 0, "sf0.001 should flag some anomalies")
    assert(r.hotBuckets.nonEmpty && r.hotBuckets.size <= 5)
    // hot buckets are genuinely over the exact threshold
    val n = Tables(spark, sf).events.count()
    r.hotBuckets.foreach { case (_, cnt) => assert(cnt > 0.01 * n) }
    assert(r.topErrorFeeder != "none")
    // one open SCD2 state per user
    val users = Tables(spark, sf).events.select("user_id").distinct().count()
    assert(r.nOpenStates == users)
  }

  test("anomaly enrichment: every anomaly gets the state valid at its time") {
    val events = Tables(spark, sf).events
    val enriched = IncidentOpsExample.anomaliesWithState(events)
    val rows = enriched
      .select($"user_id", $"at_us", $"valid_from_r", $"valid_to_r")
      .as[(Long, Long, Option[Long], Option[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, at, from, to) =>
      assert(from.isDefined, s"user $u anomaly at $at found no state")
      assert(from.get <= at, s"user $u: state opens after the anomaly")
      // the matched interval must COVER the anomaly instant (half-open)
      assert(to.get == -1L || to.get >= at,
        s"user $u: matched a state that closed before the anomaly")
    }
  }
}
