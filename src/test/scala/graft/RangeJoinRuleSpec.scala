package graft

import graft.plans.RangeJoinRule
import org.apache.spark.sql.functions._

class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  // points: one per event; intervals: per-user maintenance windows
  private def points = Tables(spark, sf).events.limit(500)
    .select(col("event_id"), unix_seconds(col("ts").cast("timestamp")).as("p"))
  private def intervals = Tables(spark, sf).events.limit(40)
    .select(col("user_id").as("iv_id"),
      unix_seconds(col("ts").cast("timestamp")).as("lo"))
    .withColumn("hi", col("lo") + 7200L)

  private def intervalJoin = points.join(intervals,
    col("p") >= col("lo") && col("p") <= col("hi"))
    .select(col("event_id"), col("iv_id"), col("p"), col("lo"), col("hi"))

  test("pure interval join rewrites to a bin equi join with identical results") {
    // baseline: no rule, no bin width → nested-loop plan
    val naivePlan = intervalJoin.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") || naivePlan.contains("Cartesian"),
      s"expected a loop join without the rule:\n$naivePlan")
    val want = intervalJoin.collect().map(_.toSeq).toSet

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRule()
    spark.conf.set("spark.graft.rangeJoin.binWidth", "3600")
    try {
      val plan = intervalJoin.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("Cartesian"),
        s"rule did not remove the loop join:\n$plan")
      assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
        s"no equi join after rewrite:\n$plan")
      val got = intervalJoin.collect().map(_.toSeq).toSet
      assert(got == want, s"rewrite changed results: missing=${want -- got} extra=${got -- want}")
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RangeJoinRule])
    }
  }

  test("rule is a no-op when disabled or when the join already has an equi key") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRule()
    try {
      // disabled: binWidth unset → loop join stays (semantics unchanged)
      val off = intervalJoin.queryExecution.executedPlan.toString
      assert(off.contains("BroadcastNestedLoopJoin") || off.contains("Cartesian"))
      // equi-keyed range join: not matched (no And of exactly two range conjuncts
      // on a bare two-sided condition) — still a hash join, still correct
      spark.conf.set("spark.graft.rangeJoin.binWidth", "3600")
      val keyed = points.withColumn("k", col("event_id") % 5)
        .join(intervals.withColumn("k", col("iv_id") % 5), Seq("k"))
        .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      assert(keyed.count() > 0)
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RangeJoinRule])
    }
  }

  test("negative values bin correctly (floor, not truncate-toward-zero)") {
    val pts = Seq(-5L, -1L, 0L, 3L).toDF("p").withColumn("pid", col("p"))
    val ivs = Seq((-6L, -2L), (-1L, 4L)).toDF("lo", "hi").withColumn("iid", col("lo"))
    val j = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      .select(col("pid"), col("iid"))
    val want = j.collect().map(_.toSeq).toSet
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRule()
    spark.conf.set("spark.graft.rangeJoin.binWidth", "4")
    try {
      val got = j.collect().map(_.toSeq).toSet
      assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RangeJoinRule])
    }
  }

  test("inverted intervals (hi < lo) yield zero matches, not a Sequence crash") {
    val pts = Seq(0L, 10L, 100L).toDF("p").withColumn("pid", col("p"))
    val ivs = Seq((7200L, 0L), (5L, 15L), (50L, 20L))
      .toDF("lo", "hi").withColumn("iid", col("lo"))
    val j = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      .select(col("pid"), col("iid"))
    val want = j.collect().map(_.toSeq).toSet // only (10, 5) qualifies
    assert(want == Set(Seq(10L, 5L)))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRule()
    spark.conf.set("spark.graft.rangeJoin.binWidth", "4")
    try {
      val got = j.collect().map(_.toSeq).toSet // would throw pre-guard
      assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    } finally {
      spark.conf.unset("spark.graft.rangeJoin.binWidth")
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RangeJoinRule])
    }
  }

  test("build-time fixed-width rewrite leaves no session conf behind") {
    assert(spark.conf.getOption("spark.graft.rangeJoin.binWidth").isEmpty)
    val df = Queries.qIntervalJoin.run(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("Cartesian"),
      s"explicit rewrite did not fire:\n$plan")
    assert(df.count() > 0)
    // the builder must NOT have armed the session-wide switch
    assert(spark.conf.getOption("spark.graft.rangeJoin.binWidth").isEmpty,
      "q_interval_join leaked the rangeJoin conf into the session")
  }
}
