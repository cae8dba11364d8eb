package graft.sim

import graft.plans.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline: one scan, per-row fused
  * cosine (native codegen expression, graft.plans.CosineSimilarity), then
  * `TakeOrderedAndProject` — no full sort, no shuffle of embedding data.
  * The IVF variant bounds scanned candidates to the probed fraction for the
  * 100 TB path.
  */
object Ann {

  /** Dot product — native codegen'd loop; accepts float/double arrays. */
  def dot(a: Column, b: Column): Column = vecDot(a, b)

  def norm(a: Column): Column = sqrt(vecDot(a, a))

  /** Cosine similarity between a vector column and a constant query vector
    * (single fused pass). */
  def cosineToQuery(vec: Column, query: Seq[Double]): Column =
    vecCosine(vec, array(query.map(lit): _*))

  /** Exact top-k by cosine against a constant query vector.
    * Ties broken by id for determinism. */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int): DataFrame =
    df.select(col(idCol).as("id"),
        round(cosineToQuery(col(vecCol), query), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)

  /** Nearest-centroid assignment via broadcast join (no corpus shuffle):
    * argmin over (dist, cid) structs is a partial aggregation. */
  private def assign(vecs: DataFrame, centroids: DataFrame): DataFrame = {
    val scored = vecs.join(broadcast(centroids), lit(true))
      .withColumn("dist", vecL2Sq(col("v"), col("cv")))
    scored.groupBy(col("id"))
      .agg(min(struct(col("dist"), col("cid"))).getField("cid").as("cid"))
      .join(vecs, "id")
  }

  /** Distributed Lloyd's k-means for IVF centroids: deterministic init
    * (first k by id), then `iters` rounds of assign → element-wise mean.
    * The mean recompute shuffles (cid, dim) partial sums — dims × k rows,
    * independent of corpus size. Returns (cid, cv). */
  def kmeansCentroids(df: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int): DataFrame = {
    val vecs = df.select(col(idCol).as("id"),
      transform(col(vecCol), _.cast("double")).as("v"))
    var centroids = vecs.orderBy(col("id")).limit(k)
      .select(col("id").as("cid"), col("v").as("cv"))
    for (_ <- 1 to iters) {
      val assigned = assign(vecs, centroids)
      centroids = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("x")).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"), transform(col("pm"), _.getField("m")).as("cv"))
        .localCheckpoint(true)
    }
    centroids
  }

  /** IVF index: the inverted lists (id, cid, v) plus the centroid table —
    * at cluster scale both are persisted tables, (re)built offline. */
  final case class IvfIndex(assigned: DataFrame, centroids: DataFrame)

  /** IVF index build: train centroids (k-means, or deterministic first-k
    * when `trainIters` = 0) and assign every vector — no corpus shuffle. */
  def ivfBuild(df: DataFrame, idCol: String, vecCol: String, nlist: Int,
      trainIters: Int = 0): IvfIndex = {
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val centroids =
      if (trainIters > 0) kmeansCentroids(df, idCol, vecCol, nlist, trainIters)
      else vecs.orderBy(col("id")).limit(nlist)
        .select(col("id").as("cid"), col("v").as("cv"))
    IvfIndex(assign(vecs, centroids), centroids)
  }

  /** Backwards-compatible form returning just the assignment table. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String, nlist: Int): DataFrame =
    ivfBuild(df, idCol, vecCol, nlist).assigned

  /** IVF query: probe the `nprobe` centroids nearest the query, brute-force
    * only vectors assigned to those lists — scans nprobe/nlist of the
    * corpus instead of all of it. */
  def ivfTopK(index: IvfIndex, query: Seq[Double], nprobe: Int, k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    val centroidIds = index.centroids
      .withColumn("dist", vecL2Sq(col("cv"), q))
      .orderBy(col("dist"), col("cid"))
      .limit(nprobe)
      .select(col("cid"))
    index.assigned.join(broadcast(centroidIds), "cid")
      .select(col("id"), round(vecCosine(col("v"), q), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** Fetch a query vector (single row, scalar parameter) as doubles. */
  def queryVector(spark: SparkSession, df: DataFrame, idCol: String, id: Long, vecCol: String): Seq[Double] =
    df.filter(col(idCol) === id)
      .select(transform(col(vecCol), _.cast("double")))
      .head().getSeq[Double](0)
}
