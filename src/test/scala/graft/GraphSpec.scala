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

  test("pageRank: zero-in-degree node keeps its rank and feeds its out-edge") {
    // directed: 1↔2 plus 3→1. Node 3 satisfies the out-edge precondition
    // but receives nothing — it must stay in the result at (1−d)/n and
    // its mass must keep flowing into node 1 every round.
    val e = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val got = Graph.pageRank(e, iters = 3).as[(Long, Double)].collect().toMap
    assert(got.size == 3, s"node set shrank: $got")
    val n = 3.0
    var pr = Map(1L -> 1 / n, 2L -> 1 / n, 3L -> 1 / n)
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L))
    val outdeg = Map(1L -> 1, 2L -> 1, 3L -> 1)
    for (_ <- 1 to 3) {
      val contrib = edges.groupBy(_._2).view
        .mapValues(_.map(ed => pr(ed._1) / outdeg(ed._1)).sum).toMap
      pr = pr.keys.map(v => v -> (0.15 / n + 0.85 * contrib.getOrElse(v, 0.0))).toMap
    }
    pr.foreach { case (v, want) =>
      assert(math.abs(got(v) - want) < 1e-12, s"node $v: ${got(v)} vs $want")
    }
    assert(math.abs(got(3L) - 0.15 / n) < 1e-12, "sink-fed node holds (1-d)/n")
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

  test("triangles: two bowtie triangles listed once each, id-sorted") {
    import spark.implicits._
    // bowtie: {1,2,3} and {3,4,5} share node 3; edge direction/duplication
    // in the input must not matter
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), // triangle A, mixed orientations
      (3L, 4L), (5L, 4L), (3L, 5L), // triangle B
      (2L, 1L) // duplicate reversed edge
    ).toDF("src", "dst")
    val got = graft.graph.Graph.triangles(edges)
      .orderBy("n1", "n2", "n3")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 3L), (3L, 4L, 5L)))
  }

  test("clustering coefficient: K4 members 1.0, bridge dilutes, pendant 0") {
    import spark.implicits._
    // K4 {1,2,3,4} + bridge 4-5 + pendant 5-6:
    //   nodes 1,2,3: deg 3, T=3 (every neighbor pair linked) → coef 1.0
    //   node 4: deg 4, T=3 → 2·3/(4·3) = 0.5
    //   node 5: deg 2, T=0 → 0.0; node 6: deg 1 → 0.0 (no neighbor pair)
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst")
    val got = graft.graph.Graph.clusteringCoefficient(edges)
      .orderBy("n")
      .select("n", "degree", "tri_count", "coef")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 3L, 1.0), (2L, 3L, 3L, 1.0), (3L, 3L, 3L, 1.0),
      (4L, 4L, 3L, 0.5), (5L, 2L, 0L, 0.0), (6L, 1L, 0L, 0.0)))
  }

  test("triangles: stars have none, K4 has four, self-loops ignored") {
    import spark.implicits._
    val star = (2L to 8L).map(v => (1L, v)).toDF("src", "dst")
    assert(graft.graph.Graph.triangles(star).count() == 0)
    val k4 = (for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b))
      .toDF("src", "dst")
    val withLoop = k4.unionAll(Seq((2L, 2L)).toDF("src", "dst"))
    val got = graft.graph.Graph.triangles(withLoop)
      .orderBy("n1", "n2", "n3").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("connectedComponents: chain, clique, singleton, direction ignored") {
    import spark.implicits._
    // chain 1-2-3-4 given in MIXED directions (weak components must not
    // care), clique {10,11,12}, and node 20 untouched by any edge
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("id")
    val got = graft.graph.Graph.connectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("connectedComponents: refuses to return an unconverged labeling") {
    import spark.implicits._
    // a 7-node path needs ~6 min-propagation rounds; maxIter=2 must throw
    // rather than hand back labels that are not yet components
    val edges = (1L to 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val nodes = (1L to 7L).toDF("id")
    intercept[IllegalStateException] {
      graft.graph.Graph.connectedComponents(nodes, edges, maxIter = 2)
    }
  }

  test("personalizedPageRank: mass concentrates at seeds; driver recompute") {
    import spark.implicits._
    // path 1-2-3-4 undirected, seed {1}: rank must decay with distance
    // from the seed, and match an exact driver-side power iteration
    val half = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val edges = (half ++ half.map(_.swap)).toDF("src", "dst")
    val got = graft.graph.Graph.personalizedPageRank(
      edges, Seq(1L).toDF("id"), iters = 3)
      .as[(Long, Double)].collect().toMap
    val und = half ++ half.map(_.swap)
    val outdeg = und.groupBy(_._1).view.mapValues(_.length).toMap
    val rst = Map(1L -> 1.0, 2L -> 0.0, 3L -> 0.0, 4L -> 0.0)
    var pr = rst
    for (_ <- 1 to 3) {
      val contrib = und.groupBy(_._2).view
        .mapValues(_.map(ed => pr(ed._1) / outdeg(ed._1)).sum).toMap
      pr = rst.keys.map(v =>
        v -> ((1.0 - 0.85) * rst(v) + 0.85 * contrib.getOrElse(v, 0.0))).toMap
    }
    assert(got.keySet == pr.keySet)
    pr.foreach { case (v, want) =>
      assert(math.abs(got(v) - want) < 1e-12, s"node $v: ${got(v)} vs $want")
    }
    // NOTE no ordering assertions beyond the exact recompute: at a
    // finite iteration count PPR on a path both oscillates with hop
    // parity AND ranks the seed's sole neighbor above the seed (the
    // seed pushes its whole rank out each round) — element-wise
    // equality with the reference is the complete check.
    // Seeds outside the graph are dropped; no in-graph seed → error
    intercept[IllegalArgumentException] {
      graft.graph.Graph.personalizedPageRank(
        edges, Seq(99L).toDF("id"), iters = 1)
    }
  }

  test("kCore: peels pendant chain, keeps clique, cascades removals") {
    import spark.implicits._
    // K4 {1,2,3,4} + chain 4-5-6: the 3-core is exactly the K4 — node 5
    // starts at degree 2, and node 6's removal must CASCADE (5 drops to
    // 1 only after 6 goes, then 5 goes too: two peel rounds)
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst")
    val got = graft.graph.Graph.kCore(edges, k = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k above the max degree → empty core, still converges
    assert(graft.graph.Graph.kCore(edges, k = 10).count() == 0)
  }

  test("incrementalComponents: merge, attach, brand-new, isolated, compose") {
    import spark.implicits._
    val nodes = (1L to 5L).toDF("id")
    val base = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val labels = graft.graph.Graph.connectedComponents(nodes, base)
    assert(labels.as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 5L))

    // delta: (2,3) merges two old components, (5,6) attaches a new node
    // to an old singleton, (7,8) is an entirely new pair, 9 arrives
    // isolated — old EDGES are not even passed in
    val delta = Seq((2L, 3L), (5L, 6L), (7L, 8L)).toDF("src", "dst")
    val got = graft.graph.Graph.incrementalComponents(
      labels, Seq(9L).toDF("id"), delta)
    val gotMap = got.as[(Long, Long)].collect().toMap
    assert(gotMap == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 7L, 9L -> 9L))

    // folds compose: a second delta bridging 9 into the big component
    // equals full recompute over everything
    val delta2 = Seq((9L, 4L)).toDF("src", "dst")
    val got2 = graft.graph.Graph.incrementalComponents(
      got, Seq.empty[Long].toDF("id"), delta2)
      .as[(Long, Long)].collect().toMap
    val full = graft.graph.Graph.connectedComponents(
      (1L to 9L).toDF("id"),
      base.unionAll(delta).unionAll(delta2))
      .as[(Long, Long)].collect().toMap
    assert(got2 == full)
  }

  test("stronglyConnectedComponents: cycles, DAG periphery, nesting") {
    import spark.implicits._
    // two 3-cycles {1,2,3} and {5,6,7} bridged one-way by 3→5 (no
    // merge), a DAG tail 7→8→9, an isolated node 10, and a back edge
    // 9→11→9 forming a 2-cycle downstream
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (5L, 6L), (6L, 7L), (7L, 5L),
      (3L, 5L), (7L, 8L), (8L, 9L),
      (9L, 11L), (11L, 9L)).toDF("src", "dst")
    val nodes = (Seq(10L) ++ (1L to 9L) ++ Seq(11L)).toDF("id")
    val got = graft.graph.Graph.stronglyConnectedComponents(nodes, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 5L,
      8L -> 8L, 9L -> 9L, 11L -> 9L, 10L -> 10L))

    // one-way bridges never fuse cycles: reversing the bridge direction
    // still leaves two SCCs (mutual reachability needs BOTH ways)
    val rev = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (5L, 6L), (6L, 7L), (7L, 5L), (5L, 3L)).toDF("src", "dst")
    val got2 = graft.graph.Graph.stronglyConnectedComponents(
      (1L to 7L).filter(_ != 4).toDF("id"), rev)
      .as[(Long, Long)].collect().toMap
    assert(got2(1L) == 1L && got2(5L) == 5L && got2(7L) == 5L)

    // adding the return bridge 1→5 fuses everything into one SCC
    val fused = graft.graph.Graph.stronglyConnectedComponents(
      (1L to 7L).filter(_ != 4).toDF("id"),
      rev.unionAll(Seq((1L, 5L)).toDF("src", "dst")))
      .as[(Long, Long)].collect().toMap
    assert(fused.values.toSet == Set(1L))
  }

  test("stronglyConnectedComponents: pure DAG splits in few rounds") {
    import spark.implicits._
    // a chain is the refinement worst case for naive FW-BW recursion;
    // the (F,B) key splits it to singletons in ONE outer round
    val chain = (1L to 19L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = graft.graph.Graph.stronglyConnectedComponents(
      (1L to 20L).toDF("id"), chain, maxOuter = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == (1L to 20L).map(i => i -> i).toMap)
  }

  test("modularity: exact stats per community, bridge counted in degrees") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6} bridged by 3-4, plus an
    // isolated node 7 in its own community; m = 7. Each triangle:
    // L = 3, d = 7 → contribution (4·7·3 − 49)/196 = 35/196 ≈ 0.1786
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val mem = Seq((1L, "A"), (2L, "A"), (3L, "A"),
      (4L, "B"), (5L, "B"), (6L, "B"), (7L, "C")).toDF("id", "community")
    val got = graft.graph.Graph.modularity(edges, mem)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          math.floor(r.getDouble(4) * 10000 + 0.5) / 10000)))
      .toMap
    assert(got("A") == ((3L, 3L, 7L, 0.1786)))
    assert(got("B") == ((3L, 3L, 7L, 0.1786)))
    assert(got("C") == ((1L, 0L, 0L, -0.0))) // 0/196 keeps floor's -0.0
    // total modularity of the two-triangle partition: 2·35/196 = 5/14
    val total = got.values.map(_._4).sum
    assert(math.abs(total - 5.0 / 14.0) < 2e-4)
  }

  test("densestSubgraphTrace: peels leaves, surfaces the planted core") {
    import spark.implicits._
    // K6 core {1..6} (15 edges) + 5 pendant leaves per core node
    // (30 edges): round 0 has n=36, m=45, density 1.25, survivor
    // threshold d·36 > 180 ⟺ d > 5 — core nodes (d=10) survive,
    // leaves (d=1) peel; round 1 is the bare clique (density 2.5,
    // threshold d > 10 kills it). The densest trace row IS the
    // planted core.
    val core = for (i <- 1L to 6L; j <- (i + 1) to 6L) yield (i, j)
    val leaves = for (i <- 1L to 6L; k <- 0L until 5L)
      yield (i, 100L + i * 10 + k)
    val got = graft.graph.Graph.densestSubgraphTrace(
      (core ++ leaves).toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map(0L -> ((36L, 45L, 1.25)), 1L -> ((6L, 15L, 2.5))))
  }

  test("hits: Gauss-Seidel order, max-norm fixed point, isolated zeros") {
    import spark.implicits._
    // 1→3, 2→3, 3→4: node 3 is the authority (fed by two hubs) and
    // also a hub into 4; node 5 is isolated. One iteration, by hand at
    // scale S = 1e6: a-raw = {3: 2S, 4: S}, max 2S → a = {3: S,
    // 4: (S·S + S) DIV 2S = 500000}; h from the NEW a (in-order
    // sweep): h-raw = {1: S, 2: S, 3: 500000}, max S → h = {1: S,
    // 2: S, 3: 500000}
    val edges = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = graft.graph.Graph.hits(
      (1L to 5L).toDF("id"), edges, iters = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got == Map(
      1L -> ((0L, 1000000L)), 2L -> ((0L, 1000000L)),
      3L -> ((1000000L, 500000L)), 4L -> ((500000L, 0L)),
      5L -> ((0L, 0L))))
  }

  test("harmonicCentrality: path sums, hop cap, direction, absence") {
    import spark.implicits._
    // undirected path 1-2-3-4-5 at H=3: ends see {1, 1/2, 1/3}, the
    // center sees its four neighbors at {1,1,1/2,1/2}; the far end
    // (distance 4) is excluded by the cap
    val half = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val und = (half ++ half.map(_.swap)).toDF("src", "dst")
    val got = graft.graph.Graph.harmonicCentrality(und, maxHops = 3)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(1L)._1 == 3L && math.abs(got(1L)._2 - 11.0 / 6) < 1e-12)
    assert(got(3L)._1 == 4L && math.abs(got(3L)._2 - 3.0) < 1e-12)
    assert(got(2L)._1 == 4L && math.abs(got(2L)._2 - (2 + 0.5 + 1.0 / 3)) < 1e-12)

    // directed chain 1→2→3: distances follow direction, so 1 is
    // reached by nobody and must be ABSENT; 3 hears 2 at 1 and 1 at 2
    val chain = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val dg = graft.graph.Graph.harmonicCentrality(chain, maxHops = 3)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(!dg.contains(1L))
    assert(dg(2L) == ((1L, 1.0)))
    assert(dg(3L)._1 == 2L && math.abs(dg(3L)._2 - 1.5) < 1e-12)

    // H=1 degenerates to in-degree
    val d1 = graft.graph.Graph.harmonicCentrality(und, maxHops = 1)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t._3).toMap
    assert(d1 == Map(1L -> 1.0, 2L -> 2.0, 3L -> 2.0, 4L -> 2.0, 5L -> 1.0))

    intercept[IllegalArgumentException] {
      graft.graph.Graph.harmonicCentrality(und, maxHops = 0)
    }
  }

  test("kTruss: drops weak edges, cascades, keeps clique with support") {
    import spark.implicits._
    // K4 {1,2,3,4} + tail: (3,5),(4,5) close triangle 3-4-5, then
    // (4,6),(5,6) close 4-5-6. At k=4 (support ≥ 2) round 1 drops the
    // three support-1 tail edges; (4,5) (support 2 via both tail
    // triangles) survives the filter but leaves the recount's support
    // agg (0 triangles) in the same round, so the bare K4 (every edge
    // support 2) is confirmed as the fixpoint immediately.
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val edges = (k4 ++ Seq((3L, 5L), (4L, 5L), (4L, 6L), (5L, 6L)))
      .toDF("src", "dst")
    val got = graft.graph.Graph.kTruss(edges, k = 4)
      .as[(Long, Long, Long)].collect().toSet
    val wantSup = k4.map { case (a, b) => (a, b, 2L) }.toSet
    assert(got == wantSup, s"got $got")
    // k above any support → empty truss, still converges
    assert(graft.graph.Graph.kTruss(edges, k = 10).count() == 0)
    // a lone triangle is exactly a 3-truss
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(graft.graph.Graph.kTruss(tri, k = 3).count() == 3)
    intercept[IllegalArgumentException] {
      graft.graph.Graph.kTruss(tri, k = 2)
    }
    // maxIter admits exactly maxIter peel rounds (round 18: `< maxIter`
    // ran at most maxIter−1, so maxIter=1 always threw). The K4+tail
    // fixture peels in ONE round (the tail dies at the seed recount,
    // (4,5)'s 0-support drop rides the same recompute) — budget 1 is
    // now genuinely enough:
    assert(graft.graph.Graph.kTruss(edges, k = 4, maxIter = 1)
      .as[(Long, Long, Long)].collect().toSet == wantSup)
    // …while a genuine TWO-round cascade (two K4s sharing triangle
    // {2,3,4}, k=5: round 1 strips the six support-2 rim edges, round 2
    // finds the shared triangle's supports fallen to 1 and clears it)
    // converges at budget 2 and throws at budget 1.
    val twoCliques = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (2L, 5L), (3L, 5L), (4L, 5L)).toDF("src", "dst")
    assert(graft.graph.Graph.kTruss(twoCliques, k = 5, maxIter = 2)
      .count() == 0)
    intercept[IllegalStateException] {
      graft.graph.Graph.kTruss(twoCliques, k = 5, maxIter = 1)
    }
  }

  test("harmonicCentralityHyperBall: fixpoint, tracks exact, deterministic") {
    import spark.implicits._
    // undirected path 1-2-3-4-5 with cap 10 ≥ diameter 4: balls hold ≤5
    // keys (linear-counting regime). Estimates are deterministic
    // functions of the md5 registers, so the asserts are structural:
    // coverage, reached near the exact count (slack absorbs a possible
    // register collision among the 5 keys), exact-form ordering
    // (center > ends), bit determinism, and capped ≡ converged.
    val half = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val und = (half ++ half.map(_.swap)).toDF("src", "dst")
    val got = graft.graph.Graph.harmonicCentralityHyperBall(und, maxHops = 10)
      .as[(Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    got.values.foreach { case (r, _) => assert(math.abs(r - 4.0) < 1.5) }
    assert(got(3L)._2 > got(1L)._2 && got(3L)._2 > got(5L)._2)
    val again = graft.graph.Graph.harmonicCentralityHyperBall(und, maxHops = 10)
      .as[(Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(again == got)
    // post-fixpoint rounds change no register and contribute exactly-0
    // curve diffs, so the diameter-capped run equals the converged one —
    // but fixpoint DETECTION needs one no-change round, so maxHops =
    // diameter is a truncation under the round-18 loud contract: the
    // capped-unroll caller opts in, the default throws
    val capped = graft.graph.Graph.harmonicCentralityHyperBall(
        und, maxHops = 4, allowTruncation = true)
      .as[(Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(capped == got)
    intercept[IllegalStateException] {
      graft.graph.Graph.harmonicCentralityHyperBall(und, maxHops = 4)
    }
    intercept[IllegalArgumentException] {
      graft.graph.Graph.harmonicCentralityHyperBall(und, maxHops = 0)
    }
  }

  test("harmonicCentralityHyperBall: directed sink gets its own ball") {
    import spark.implicits._
    // directed 1→2: node 2 is in-only. Pre-round-18 the seed came from
    // src nodes only, so 2 never got its t=0 self-sketch — reached read
    // est−1 = 0 instead of 1 and its curve started at t=1, dropping the
    // distance-1 shell from harmonic. Balls hold ≤2 keys (linear
    // counting), so estimates are near-exact; slack absorbs a register
    // collision between the 2 keys.
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val got = graft.graph.Graph.harmonicCentralityHyperBall(e, maxHops = 10)
      .as[(Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got.keySet == Set(1L, 2L))
    val (r1, h1) = got(1L) // nothing reaches 1
    assert(math.abs(r1) < 0.1 && math.abs(h1) < 0.1)
    val (r2, h2) = got(2L) // 1 reaches 2 at distance 1
    assert(math.abs(r2 - 1.0) < 0.3, s"sink reached=$r2")
    assert(math.abs(h2 - 1.0) < 0.3, s"sink harmonic=$h2")
  }

  test("reachability: fused forward/backward flags, unreached absent") {
    import spark.implicits._
    // 4 → 1 → 2 → 3, plus disconnected 5 → 6; seed {1}
    val e = Seq((1L, 2L), (2L, 3L), (4L, 1L), (5L, 6L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val got = graft.graph.Graph.reachability(seeds, e)
      .as[(Long, Boolean, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got == Map(
      1L -> ((true, true)),   // seed: both flags
      2L -> ((true, false)),  // seed reaches it
      3L -> ((true, false)),  // two hops forward
      4L -> ((false, true)))) // reaches the seed
    // multi-source: flags are ORs over the seed set
    val got2 = graft.graph.Graph.reachability(Seq(3L, 4L).toDF("id"), e)
      .as[(Long, Boolean, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got2(1L) == ((true, true))) // 4 reaches 1; 1 reaches 3
    assert(got2(2L) == ((true, true)))
    assert(!got2.contains(5L) && !got2.contains(6L))
    intercept[IllegalStateException] {
      graft.graph.Graph.reachability(seeds, e, maxRounds = 1)
    }
  }

  test("labelPropagate: spread, clamp, tie to smallest, keep when unvoted") {
    import spark.implicits._
    // undirected path 1-2-3-4-5, seeds 1→100 and 5→200
    val half = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (half ++ half.map(_.swap)).toDF("src", "dst")
    val nodes = (1L to 5L).toDF("id")
    val seeds = Seq((1L, 100L), (5L, 200L)).toDF("id", "label")

    // round 1: 2←{100}, 4←{200}; 3 has no labeled neighbor yet
    val r1 = graft.graph.Graph.labelPropagate(nodes, seeds, edges, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 100L, 2L -> 100L, 4L -> 200L, 5L -> 200L))

    // round 2: 3 sees {100 via 2, 200 via 4} — 1-1 tie → smallest label;
    // seeds stay clamped even though each now has a differently-labeled
    // neighbor; 2 and 4 keep their labels (their winner is unchanged)
    val r2 = graft.graph.Graph.labelPropagate(nodes, seeds, edges, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(
      1L -> 100L, 2L -> 100L, 3L -> 100L, 4L -> 200L, 5L -> 200L))
  }

  test("labelPropagate: majority beats minority; isolated nodes absent") {
    import spark.implicits._
    // node 10 hears 200 twice (from 21, 22) and 100 once (from 20);
    // node 99 has no edges at all
    val edges = Seq((10L, 20L), (10L, 21L), (10L, 22L)).toDF("src", "dst")
    val nodes = Seq(10L, 20L, 21L, 22L, 99L).toDF("id")
    val seeds = Seq((20L, 100L), (21L, 200L), (22L, 200L)).toDF("id", "label")
    val got = graft.graph.Graph.labelPropagate(nodes, seeds, edges, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 200L, 20L -> 100L, 21L -> 200L, 22L -> 200L))
  }

  test("hopDistance: multi-source min, cap excludes, direction respected") {
    import spark.implicits._
    // path 1→2→3→4→5 plus a second seed 4; 9→1 points INTO seed 1, so 9
    // is unreachable along edge direction
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (9L, 1L))
      .toDF("src", "dst")
    val seeds = Seq(1L, 4L).toDF("id")
    val got = graft.graph.Graph.hopDistance(seeds, edges, maxHops = 2)
      .as[(Long, Long)].collect().toMap
    // node 4 is a seed (0), not 3 hops from seed 1; node 5 is 1 via seed 4;
    // node 9 absent (no directed path); cap 2 would exclude nothing here
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 0L, 5L -> 1L))
    val capped = graft.graph.Graph.hopDistance(
      Seq(1L).toDF("id"), edges, maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(capped == Map(1L -> 0L, 2L -> 1L, 3L -> 2L), "4,5 beyond cap")
  }

  test("shortestPaths: cheaper long path beats heavy direct edge") {
    import spark.implicits._
    // 1→4 direct costs 10; 1→2→3→4 costs 3; 4→5 reachable only round 4
    val edges = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L),
      (3L, 4L, 1L), (4L, 5L, 2L)).toDF("src", "dst", "w")
    val got = graft.graph.Graph.shortestPaths(
      Seq(1L).toDF("id"), edges, maxRounds = 6)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 5L))
  }

  test("shortestPaths: round bound = min over ≤r-edge paths exactly") {
    import spark.implicits._
    val edges = Seq((1L, 4L, 10L), (1L, 2L, 1L), (2L, 3L, 1L),
      (3L, 4L, 1L)).toDF("src", "dst", "w")
    // with only 2 rounds, node 4's best ≤2-edge path is the direct 10
    val got = graft.graph.Graph.shortestPaths(
      Seq(1L).toDF("id"), edges, maxRounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 10L))
  }

  /** Driver-side replica of the walk's portable choice hash. */
  private def md5Pick(walkId: Long, step: Int, node: Long, deg: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$walkId:$step:$node".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    (BigInt(hex, 16) % deg).toInt + 1
  }

  test("randomWalks: hops follow edges, hash-determined, reproducible") {
    val edges = Graph.undirected(
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst"))
    val starts = Seq((1L, 1L), (4L, 4L)).toDF("walk_id", "node")
    val got = Graph.randomWalks(edges, starts, steps = 3)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

    // driver-side replay with the same md5 choice lane
    val adj = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def replay(w: Long): Seq[Long] =
      (1 to 3).scanLeft(w) { (cur, s) =>
        val ns = adj(cur); ns(md5Pick(w, s, cur, ns.size) - 1)
      }
    assert(got == Map(1L -> replay(1L), 4L -> replay(4L)))
    // deterministic: a second run yields the identical walks
    val again = Graph.randomWalks(edges, starts, steps = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(again == Graph.randomWalks(edges, starts, steps = 3)
      .as[(Long, Long, Long)].collect().toSet)
  }

  test("louvainMove: one sweep matches hand-computed integer gains") {
    // two triangles bridged at 3-4; m=7. Hand-scored S = 2m·k_vC − tot'·k_v:
    // node 1: C2 → 14−4=10 beats C3 (8) and own (0) → 2; node 2 → 1;
    // node 3: C1 and C2 tie at 8 → smaller cid 1; symmetric on the right.
    // The synchronous 1↔2 / 5↔6 swap is the documented variant behavior.
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val und = Graph.undirected(base.toDF("src", "dst"))
    val a0 = (1L to 6L).map(n => (n, n)).toDF("node", "cid")
    val got = Graph.louvainMove(und, a0)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 1L,
      4L -> 5L, 5L -> 6L, 6L -> 5L), s"got $got")
  }

  test("louvainMove: isolated node keeps its community") {
    val und = Graph.undirected(Seq((1L, 2L)).toDF("src", "dst"))
    val a0 = Seq((1L, 1L), (2L, 2L), (9L, 7L)).toDF("node", "cid")
    val got = Graph.louvainMove(und, a0).as[(Long, Long)].collect().toMap
    assert(got(9L) == 7L, s"isolated node dropped or moved: $got")
    assert(got.keySet == Set(1L, 2L, 9L))
  }

  test("louvain: rounds from singletons converge the bridged triangles") {
    val base = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
    val und = Graph.undirected(base.toDF("src", "dst"))
    val g1 = Graph.louvain(und, rounds = 1).as[(Long, Long)].collect().toMap
    val move = Graph.louvainMove(und,
      (1L to 6L).map(n => (n, n)).toDF("node", "cid"))
      .as[(Long, Long)].collect().toMap
    assert(g1 == move, "louvain(1) must equal one louvainMove from singletons")
  }

  test("node2vecWalks: biased hops match a driver-side inverse-CDF replay") {
    // path-ish graph with a triangle so all three weight classes occur:
    // 1-2, 2-3, 3-1 (triangle), 3-4, 4-5
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
    val edges = Graph.undirected(base.toDF("src", "dst"))
    val starts = Seq((1L, 1L), (4L, 4L)).toDF("walk_id", "node")
    val p = 4.0; val q = 0.25
    val got = Graph.node2vecWalks(edges, starts, steps = 3, p, q)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

    val adj = base.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val eset = base.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
    def md60(s: String): BigInt = {
      val md = java.security.MessageDigest.getInstance("MD5")
      BigInt(md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x")
        .mkString.take(15), 16)
    }
    def replay(w: Long): Seq[Long] = {
      var prev = w
      val first = {
        val ns = adj(w)
        ns((md60(s"$w:1:$w") % ns.size).toInt)
      }
      var cur = first
      var path = Seq(w, first)
      for (s <- 2 to 3) {
        val ns = adj(cur)
        val wts = ns.map { x =>
          if (x == prev) 1.0 / p
          else if (eset((prev, x))) 1.0
          else 1.0 / q
        }
        val cums = wts.scanLeft(0.0)(_ + _).tail
        val r = (md60(s"$w:$s:$prev:$cur").toDouble / math.pow(2, 60)) *
          cums.last
        val next = ns(cums.indexWhere(_ >= r))
        prev = cur; cur = next; path :+= next
      }
      path
    }
    assert(got == Map(1L -> replay(1L), 4L -> replay(4L)),
      s"got $got vs ${Map(1L -> replay(1L), 4L -> replay(4L))}")
  }

  test("randomWalks: dead-end walk stops early, step 0 is the start") {
    // directed chain 1→2, node 2 has no out-edge: walk ends after hop 1
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val starts = Seq((1L, 1L)).toDF("walk_id", "node")
    val got = Graph.randomWalks(edges, starts, steps = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    assert(got.toSeq == Seq((1L, 0L, 1L), (1L, 1L, 2L)))
  }

  test("lubyMis: independent, maximal, deterministic; isolated nodes join") {
    // path 1-2-3-4-5, a triangle 6-7-8, and isolated node 9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (6L, 7L), (7L, 8L), (6L, 8L)).toDF("src", "dst")
    val nodes = (1L to 9L).toDF("id")
    val out = Graph.lubyMis(nodes, edges, maxRounds = 8)
      .as[(Long, Boolean, Long)].collect().sortBy(_._1)
    val mis = out.filter(_._2).map(_._1).toSet
    val und = Seq((1, 2), (2, 3), (3, 4), (4, 5), (6, 7), (7, 8), (6, 8))
      .map { case (a, b) => (a.toLong, b.toLong) }
    // independence: no edge inside the MIS
    und.foreach { case (a, b) =>
      assert(!(mis(a) && mis(b)), s"edge ($a,$b) inside MIS $mis")
    }
    // maximality: every non-member has a MIS neighbor
    val nbrs = (und ++ und.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    (1L to 9L).filterNot(mis).foreach { v =>
      assert(nbrs.getOrElse(v, Set.empty).exists(mis),
        s"non-member $v has no MIS neighbor — not maximal")
    }
    assert(mis(9L), "isolated node must be in every MIS")
    // exactly one triangle vertex
    assert(Seq(6L, 7L, 8L).count(mis) == 1)
    // deterministic across runs
    val again = Graph.lubyMis(nodes, edges, maxRounds = 8)
      .as[(Long, Boolean, Long)].collect().sortBy(_._1)
    assert(out.toSeq == again.toSeq)
  }
}
