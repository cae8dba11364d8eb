package graft

import graft.examples.GraphCurationExample

class GraphCurationExampleSpec extends SparkSpec {
  import spark.implicits._

  test("graph curation report: stages cohere on a known graph") {
    // two islands: K4 {1..4} with pendant 5, and triangle {10,11,12};
    // seeds: 1 (label 100) and 10 (label 200)
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val half = k4 ++ Seq((4L, 5L), (10L, 11L), (11L, 12L), (10L, 12L))
    val edges = (half ++ half.map(_.swap)).toDF("src", "dst")
    val nodes = (Seq(5L) ++ (1L to 4L) ++ Seq(10L, 11L, 12L)).toDF("id")
    val seeds = Seq((1L, 100L), (10L, 200L)).toDF("id", "label")

    val curated = GraphCurationExample
      .curate(nodes, edges, seeds, k = 3, maxHops = 2, labelIters = 2)
      .as[(Long, Long, Option[Long], Option[Long], Boolean)]
      .collect().map(r => r._1 -> r).toMap

    // components: {1..5} → 1, {10,11,12} → 10
    assert(curated(5L)._2 == 1L && curated(12L)._2 == 10L)
    // hop distance from seeds {1, 10}: node 5 is 2 away (via 4), node 12 is 1
    assert(curated(5L)._3.contains(2L) && curated(12L)._3.contains(1L))
    // labels spread within islands only
    assert(curated(4L)._4.contains(100L) && curated(11L)._4.contains(200L))
    assert(curated(5L)._4.contains(100L))
    // 3-core: K4 only — the pendant AND the triangle (degree 2) fall out
    assert(curated(1L)._5 && curated(4L)._5)
    assert(!curated(5L)._5 && !curated(10L)._5)

    val rep = GraphCurationExample.report(
      GraphCurationExample.curate(nodes, edges, seeds, 3, 2, 2))
    assert(rep.nComponents == 2)
    assert(rep.nSeeded == 8)   // every node acquires a label in 2 rounds
    assert(rep.nInCore == 4)
    assert(rep.maxHops == 2)
  }
}
