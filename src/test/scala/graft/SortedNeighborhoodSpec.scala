package graft

import graft.dedup.SortedNeighborhood
import org.apache.spark.sql.functions._

class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  test("globalPositions: matches the total order, deterministic ties") {
    // duplicate sort keys ("bb" twice) — the id tiebreak fixes the order;
    // 7 rows spread across the session's 32 range partitions exercises
    // empty partitions and offset accumulation
    val df = Seq(
      (5L, "bb"), (1L, "cc"), (4L, "aa"), (2L, "bb"), (7L, "dd"),
      (3L, "aa"), (6L, "ee")).toDF("id", "name")
    val got = SortedNeighborhood.globalPositions(df, "id", Seq("name"))
      .as[(Long, Long)].collect().toMap
    // order: (aa,3),(aa,4),(bb,2),(bb,5),(cc,1),(dd,7),(ee,6)
    assert(got == Map(3L -> 0L, 4L -> 1L, 2L -> 2L, 5L -> 3L, 1L -> 4L,
      7L -> 5L, 6L -> 6L))
  }

  test("candidatePairs: window band, each unordered pair once, gap") {
    val df = Seq((10L, "a"), (20L, "b"), (30L, "c"), (40L, "d"))
      .toDF("id", "name")
    // w=3: positions 0..3, pairs with gap 1..2
    val got = SortedNeighborhood.candidatePairs(df, "id", Seq("name"), 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (10L, 20L, 1L), (20L, 30L, 1L), (30L, 40L, 1L),
      (10L, 30L, 2L), (20L, 40L, 2L)))
    // w=2 degenerates to adjacent-only
    val adj = SortedNeighborhood.candidatePairs(df, "id", Seq("name"), 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(adj == Set((10L, 20L, 1L), (20L, 30L, 1L), (30L, 40L, 1L)))
    intercept[IllegalArgumentException] {
      SortedNeighborhood.candidatePairs(df, "id", Seq("name"), 1)
    }
  }

  test("candidatePairs: near-misses with different first words still pair") {
    // equality blocking on the first word would NEVER compare these two;
    // the sorted window does (they sort adjacently)
    val df = Seq(
      (1L, "goldenrod lace almond"), (2L, "goldenrod lavender almond"),
      (3L, "aquamarine steel")).toDF("id", "name")
    val pairs = SortedNeighborhood.candidatePairs(df, "id", Seq("name"), 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 1L)))
  }
}
