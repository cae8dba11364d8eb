package graft

import graft.graph.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("undirected: both orientations, deduped") {
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    val u = Graph.undirected(e).as[(Long, Long)].collect().toSet
    assert(u == Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("pageRank: uniform rank is a fixed point on a cycle") {
    // 4-cycle, undirected: every node has degree 2 and the uniform
    // vector is exactly stationary at every iteration count.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val pr = Graph.pageRank(Graph.undirected(e), iters = 4)
      .as[(Long, Double)].collect().toMap
    assert(pr.size == 4)
    pr.values.foreach(v => assert(math.abs(v - 0.25) < 1e-12))
  }

  test("pageRank: star center outranks leaves; matches driver recompute") {
    val edges = (2L to 6L).map(l => (1L, l))
    val e = edges.toDF("src", "dst")
    val got = Graph.pageRank(Graph.undirected(e), iters = 3, damping = 0.85)
      .as[(Long, Double)].collect().toMap

    // independent driver-side power iteration over the same graph
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val nodes = und.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val n = nodes.length
    val outdeg = und.groupBy(_._1).view.mapValues(_.length).toMap
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      val contrib = und.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(ed => pr(ed._1) / outdeg(ed._1)).sum
      }
      pr = nodes.map(v => v -> (0.15 / n + 0.85 * contrib(v))).toMap
    }
    assert(got.size == n)
    nodes.foreach(v => assert(math.abs(got(v) - pr(v)) < 1e-12, s"node $v"))
    val leaves = (2L to 6L).map(got)
    assert(leaves.forall(l => got(1L) > l * 2), "hub must dominate leaves")
    assert(leaves.distinct.size == 1, "symmetric leaves must tie exactly")
  }
}
