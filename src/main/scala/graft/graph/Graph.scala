package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational graph algorithms over an edge DataFrame.
  *
  * Reference scope: pypeman has no graph operators — this generalizes the
  * iterative small-state loop shape graft already uses for dedup
  * clustering (connected components, `dedup/Dedup.scala`) into a reusable
  * module for graph-shaped curation work (domain authority scoring, link
  * spam detection, citation weighting).
  *
  * Scale shape shared by both algorithms: per iteration ONE shuffle keyed
  * on a uniform node id; the iterate relation is localCheckpoint()ed each
  * round so lineage stays constant-depth (no exponential plan growth) and
  * the driver never holds node-count-sized data.
  */
object Graph {

  /** Undirected closure of an edge list: both orientations, deduped.
    * Guarantees every node has out-degree ≥ 1, which keeps [[pageRank]]
    * free of dangling-mass bookkeeping. */
  def undirected(edges: DataFrame): DataFrame = {
    val e = edges.toDF("src", "dst")
    e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
  }

  /** PageRank with damping `d` over a directed edge list in which every
    * node has at least one out-edge (use [[undirected]] to guarantee it).
    * Fixed `iters` power iterations from the uniform vector:
    *
    *   pr'(v) = (1 − d)/N + d · Σ_{(u,v)∈E} pr(u)/outdeg(u)
    *
    * Returns (id, pr). Each iteration is: edges ⋈ ranks on src (shuffle
    * keyed on src, uniform), re-agg by dst — no broadcast of anything
    * node-count-sized, so the same plan runs at 10⁹ nodes. Degrees are
    * computed once and reused; ranks are checkpointed per round. */
  def pageRank(
      edges: DataFrame,
      iters: Int,
      damping: Double = 0.85,
      checkpointEvery: Int = 4): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    // materialize the edge list once: it feeds the degree agg, the
    // weighted-edge join AND the node count — without the checkpoint a
    // union+distinct upstream would run three times
    val e = edges.toDF("src", "dst").localCheckpoint()
    // weighted edge list: w = 1/outdeg(src), computed ONCE and reused by
    // every iteration (the per-round join then carries a single relation)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ew = e.join(deg, "src")
      .select(col("src"), col("dst"), (lit(1.0) / col("outdeg")).as("w"))
      .localCheckpoint()
    val n = deg.count() // every node has an out-edge → deg carries all nodes
    val nodes = deg.select(col("src").as("nid")).localCheckpoint()
    var ranks = nodes.select(col("nid").as("id"), lit(1.0 / n).as("pr"))
    for (i <- 1 to iters) {
      // left join back onto the node set: a node with no IN-edges still
      // holds (1−d)/n and keeps feeding its out-edges next round —
      // an inner join would silently drop it (and its rank mass) here
      val contribs = ew
        .join(ranks, ew("src") === ranks("id"))
        .groupBy(col("dst"))
        .agg(sum(col("pr") * col("w")).as("contrib"))
      ranks = nodes
        .join(contribs, col("nid") === col("dst"), "left")
        .select(col("nid").as("id"),
          (lit((1.0 - damping) / n)
            + lit(damping) * coalesce(col("contrib"), lit(0.0))).as("pr"))
      // truncate lineage periodically, not per round: a checkpoint is an
      // eager job, and a handful of chained join+agg stages is exactly
      // what Catalyst pipelines well — only unbounded chains need cutting
      if (i % checkpointEvery == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }
}
