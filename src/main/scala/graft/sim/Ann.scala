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

  /** IVF index build: pick the first `nlist` vectors (by id order) as
    * centroids — deterministic "training" (real k-means is an offline job;
    * the partitioning/probing shape is identical). Assign every vector to
    * its nearest centroid via broadcast join — no shuffle of the corpus. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String, nlist: Int): DataFrame = {
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val centroids = vecs.orderBy(col("id")).limit(nlist)
      .select(col("id").as("cid"), col("v").as("cv"))
    val scored = vecs.join(broadcast(centroids), lit(true))
      .withColumn("dist", vecL2Sq(col("v"), col("cv")))
    // argmin centroid per vector: min over (dist, cid) struct — partial agg
    scored.groupBy(col("id"))
      .agg(min(struct(col("dist"), col("cid"))).getField("cid").as("cid"))
      .join(vecs, "id")
  }

  /** IVF query: probe the `nprobe` centroids nearest the query, brute-force
    * only vectors assigned to those lists. */
  def ivfTopK(
      assigned: DataFrame, // (id, cid, v) from ivfAssign
      query: Seq[Double],
      nprobe: Int,
      k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    // a centroid is assigned to itself (distance 0), so the centroid set is
    // a filter on `assigned` — no extra join, one scan
    val centroidIds = assigned
      .filter(col("id") === col("cid"))
      .withColumn("dist", vecL2Sq(col("v"), q))
      .orderBy(col("dist"), col("cid"))
      .limit(nprobe)
      .select(col("cid"))
    assigned.join(broadcast(centroidIds), "cid")
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
