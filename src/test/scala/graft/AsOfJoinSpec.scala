package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def probes = Seq(
    // (user, t, id)
    (1L, 10L, 100L), // before any ref → null
    (1L, 20L, 101L), // exactly at ref t=20 → inclusive match
    (1L, 35L, 102L), // between 30 and 40 → ref at 30
    (2L, 50L, 103L), // user 2 has no refs at all → null
    (3L, 60L, 104L)  // ref exists only AFTER probe → null
  ).toDF("user_id", "t", "event_id")

  private def refs = Seq(
    (1L, 20L, 200L),
    (1L, 20L, 201L), // same time as 200 → tiebreak picks greatest id
    (1L, 30L, 202L),
    (1L, 40L, 203L),
    (3L, 99L, 204L)
  ).toDF("user_id", "t", "event_id")

  test("backward semantics: inclusive bound, ties, no-match nulls") {
    val out = AsOf.joinBackward(probes, refs, "user_id", "t", "t", "event_id")
      .select($"event_id", $"event_id_r")
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(
      100L -> None,
      101L -> Some(201L), // t=20 inclusive; tie → greatest id wins
      102L -> Some(202L),
      103L -> None,
      104L -> None        // ref at t=99 is after the probe
    ))
  }

  test("NULL key/time never matches on either side (merge_asof semantics)") {
    val probesN = Seq(
      (Some(1L), Some(25L), 100L), // normal: matches ref id 200 at t=20
      (None, Some(25L), 101L),     // null key → null match
      (Some(1L), None, 102L)       // null time → null match
    ).toDF("user_id", "t", "event_id")
    val refsN = Seq(
      (Some(1L), Some(20L), 200L),
      (None, Some(5L), 201L),      // null key: never a candidate
      (Some(1L), None, 202L)       // null time: would sort first and
                                   // qualify for every probe if unfiltered
    ).toDF("user_id", "t", "event_id")
    val out = AsOf.joinBackward(probesN, refsN, "user_id", "t", "t", "event_id")
      .select($"event_id", $"event_id_r")
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(
      100L -> Some(200L),
      101L -> None,
      102L -> None))
  }

  test("every probe row survives exactly once (left-outer cardinality)") {
    val out = AsOf.joinBackward(probes, refs, "user_id", "t", "t", "event_id")
    assert(out.count() == 5)
    assert(out.columns.toSeq ==
      Seq("user_id", "t", "event_id", "user_id_r", "t_r", "event_id_r"))
  }

  test("self-as-of over one table is safe (fresh right attribute ids)") {
    val ev = probes.unionByName(refs)
    val out = AsOf.joinBackward(ev, ev, "user_id", "t", "t", "event_id")
    // each row matches itself (t <= t inclusive, greatest id at same t)
    assert(out.count() == ev.count())
  }

  test("matches the union+window composition on real events") {
    val native = Queries.qAsofNative.run(spark, sf)
      .select("event_id", "asof_purchase_id")
      .as[(Long, Option[Long])].collect().toMap
    val window = Queries.qAsofJoin.run(spark, sf)
      .select("event_id", "asof_purchase_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(native.nonEmpty && native == window)
  }

  test("plan: AsOfJoinExec with one exchange + sort per side, no window") {
    val df = Queries.qAsofNative.run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("Window"), s"window leaked into native path:\n$plan")
    val exchanges = plan.split("Exchange hashpartitioning").length - 1
    assert(exchanges == 2, s"expected 2 exchanges (one per side):\n$plan")
  }
}
