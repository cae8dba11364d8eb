package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph-neural-network building blocks over relational (nodes, edges)
  * pairs — the aggregation step of GraphSAGE (Hamilton et al. 2017)
  * expressed as joins + the partial-aggregatable
  * [[graft.plans.VecMean]] vector mean.
  *
  * Reference scope: pypeman has no GNN surface; this serves the
  * training-data side — propagating document/embedding features over a
  * similarity or citation graph (label smoothing, neighborhood-aware
  * quality scores) before sampling a corpus.
  */
object Gnn {

  /** One GraphSAGE mean-aggregation layer:
    *
    *   h'(v) = L2-normalize( h(v) ⧺ mean{ h(u) : (v,u) ∈ edges } )
    *
    * `nodes` carries (idCol, vecCol: array&lt;float|double&gt;); `edges`
    * is (src, dst) with BOTH orientations present for an undirected
    * neighborhood (compose with [[graft.graph.Graph.undirected]]).
    * Nodes with no out-edges aggregate a zero vector — they stay in the
    * output (the isolated-node convention of the paper's mean
    * aggregator). Returns (idCol, h: array&lt;double&gt;) of width
    * 2 × dim.
    *
    * Scale shape: ONE edge-keyed shuffle (join edges ⋈ nodes on dst,
    * uniform key), then the VecMean partial aggregate — only
    * num-nodes × dim doubles cross the second exchange, never a
    * neighbor-list-sized relation; the self side re-joins on the node
    * id. No windows, no driver materialization, so the layer runs
    * unchanged on a 10⁹-node graph.
    */
  def sageMeanLayer(
      nodes: DataFrame,
      edges: DataFrame,
      idCol: String,
      vecCol: String): DataFrame = {
    val e = edges.toDF("src", "dst")
    val nbrMean = e
      .join(nodes.select(col(idCol).as("dst"), col(vecCol).as("__nv")), "dst")
      .groupBy(col("src"))
      .agg(graft.plans.VecMean.vecMean(col("__nv")).as("__nmean"))
    nodes
      .select(col(idCol),
        transform(col(vecCol), x => x.cast("double")).as("__self"))
      .join(nbrMean, col(idCol) === col("src"), "left")
      .withColumn("__h",
        concat(col("__self"),
          // zero vector of the node's own width — no static dim needed
          coalesce(col("__nmean"), transform(col("__self"), _ => lit(0.0)))))
      .withColumn("__norm",
        sqrt(aggregate(col("__h"), lit(0.0), (a, x) => a + x * x)))
      .select(col(idCol),
        transform(col("__h"),
          x => x / greatest(col("__norm"), lit(1e-12))).as("h"))
  }
}
