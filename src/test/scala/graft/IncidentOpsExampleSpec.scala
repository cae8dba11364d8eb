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

  test("duplicate-timestamp tail: enrichment picks the CURRENT state, not the superseded one") {
    // user 9000001's last two events share a timestamp; the open (current)
    // state must win the tie — a valid_to tiebreak would pick the
    // superseded zero-length interval (its -1 sentinel sorts below t)
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val ev = Seq(
      // trailing-window history: 21 calm readings then a spike (anomaly)
      (1L to 21L).map(i => (9000001L, i, ts(i * 1000), "view", 10.0)),
      Seq((9000001L, 22L, ts(30000L), "error", 9999.0),   // anomaly at t=30s
          (9000001L, 23L, ts(30000L), "view", 42.0))      // same ts, later event
    ).flatten.toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = IncidentOpsExample.anomaliesWithState(ev)
      .select($"event_id", $"event_id_r", $"value_r", $"valid_to_r")
      .as[(Long, Long, Double, Long)].collect()
    assert(out.map(_._1).toSet.contains(22L), "spike not flagged")
    val (_, matchedId, matchedVal, matchedTo) = out.find(_._1 == 22L).get
    assert(matchedId == 23L && matchedVal == 42.0 && matchedTo == -1L,
      s"anomaly matched superseded state: event $matchedId val $matchedVal to $matchedTo")
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
