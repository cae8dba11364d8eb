package graft.examples

import graft.graph.Graph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Link-graph curation over a co-occurrence graph — this session's graph
  * wave composed the way a corpus-trust job runs it:
  *
  *   1. COMMUNITIES: weakly-connected components partition the graph
  *      into co-purchase islands;
  *   2. TRUST SPREAD: hop distance from a trusted seed set bounds how
  *      far each node sits from known-good anchors (the spam-distance
  *      gate), and label propagation densifies seed labels over the
  *      same edges;
  *   3. DENSE CORES: the k-core keeps only nodes holding ≥ k neighbors
  *      — the link-farm / community-core density tier;
  *   4. REPORT: per-community size, seed coverage, core membership and
  *      trust distance roll up into one curation table.
  *
  * Scale shape: every stage is the per-round bounded-shuffle loop its
  * operator documents (one uniform node-keyed exchange per round, state
  * checkpointed, nothing node-count-sized at the driver); the report
  * itself is two joins + one aggregation over node-count rows.
  */
object GraphCurationExample {

  final case class Report(
      nComponents: Long,
      nSeeded: Long,
      nInCore: Long,
      maxHops: Long)

  /** Per-node curation table: component, hop distance from seeds (null
    * when unreached), propagated label (null when never reached), core
    * membership flag. */
  def curate(
      nodes: DataFrame, edges: DataFrame, seeds: DataFrame,
      k: Int, maxHops: Int, labelIters: Int): DataFrame = {
    val comp = Graph.connectedComponents(nodes, edges)
    val hops = Graph.hopDistance(seeds.select(col("id")), edges, maxHops)
      .select(col("id").as("hid"), col("hops"))
    val labels = Graph.labelPropagate(nodes, seeds, edges, labelIters)
      .select(col("id").as("lid"), col("label"))
    val core = Graph.kCore(edges, k)
      .select(col("id").as("cid"), lit(true).as("in_core"))
    comp
      .join(hops, col("id") === col("hid"), "left")
      .join(labels, col("id") === col("lid"), "left")
      .join(core, col("id") === col("cid"), "left")
      .select(col("id"), col("component"), col("hops"), col("label"),
        coalesce(col("in_core"), lit(false)).as("in_core"))
  }

  def report(curated: DataFrame): Report = {
    val row = curated.agg(
      countDistinct(col("component")).as("nc"),
      count(col("label")).as("ns"),
      sum(when(col("in_core"), 1L).otherwise(0L)).as("nk"),
      max(col("hops")).as("mh")).head()
    Report(row.getLong(0), row.getLong(1), row.getLong(2),
      if (row.isNullAt(3)) -1L else row.getLong(3))
  }
}
