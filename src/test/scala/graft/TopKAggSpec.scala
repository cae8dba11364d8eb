package graft

import graft.plans.TopKByScore.topkByScore
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("topk aggregate equals window formulation, with tie-break on id") {
    val df = Seq(
      ("a", 5.0, 1L), ("a", 5.0, 2L), ("a", 7.0, 3L), ("a", 1.0, 4L),
      ("b", 2.0, 5L)).toDF("g", "s", "i")
    val got = df.groupBy(col("g"))
      .agg(topkByScore(col("s"), col("i"), 2).as("top"))
      .select(col("g"), col("top"))
      .as[(String, Seq[(Double, Long)])].collect().toMap
    assert(got("a") == Seq((7.0, 3L), (5.0, 1L))) // 5.0 tie → lower id kept
    assert(got("b") == Seq((2.0, 5L)))
  }

  test("topk aggregate runs with partial (map-side) aggregation") {
    val plan = Tables(spark, sf).part
      .groupBy(col("p_brand"))
      .agg(topkByScore(col("p_retailprice"), col("p_partkey"), 3))
      .queryExecution.executedPlan.toString
    // ObjectHashAggregate appears twice: partial before the exchange,
    // final after — the property that bounds shuffle volume to k per group
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert("partial_topk_by_score|ObjectHashAggregate".r
      .findAllIn(plan).size >= 2, plan)
  }
}
