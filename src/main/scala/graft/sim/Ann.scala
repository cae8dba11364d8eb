package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline: one scan, per-row dot
  * product (codegen `zip_with`+`aggregate`), then `TakeOrderedAndProject` —
  * no full sort, no shuffle of the embedding data. The IVF variant bounds
  * scanned candidates to the probed fraction for the 100 TB path.
  */
object Ann {

  /** Dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Cosine similarity between a vector column and a constant query vector. */
  def cosineToQuery(vec: Column, query: Seq[Double]): Column = {
    val q = array(query.map(lit): _*)
    val v = asDouble(vec)
    dot(v, q) / (norm(v) * norm(q))
  }

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
    * its nearest centroid via broadcast join — no shuffle of the corpus.
    */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String, nlist: Int): DataFrame = {
    val vecs = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val centroids = vecs.orderBy(col("id")).limit(nlist)
      .select(col("id").as("cid"), col("v").as("cv"))
    val scored = vecs.join(broadcast(centroids), lit(true))
      .withColumn("dist",
        aggregate(zip_with(col("v"), col("cv"), (a, b) => (a - b) * (a - b)),
          lit(0.0), _ + _))
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
    val centroidIds = assigned
      .select(col("cid")).distinct()
      .join(assigned.select(col("id").as("cid2"), col("v")), col("cid") === col("cid2"))
      .withColumn("dist", aggregate(zip_with(col("v"), q, (a, b) => (a - b) * (a - b)), lit(0.0), _ + _))
      .orderBy(col("dist"), col("cid"))
      .limit(nprobe)
      .select(col("cid"))
    assigned.join(broadcast(centroidIds), "cid")
      .select(col("id"), round(dot(col("v"), q) / (norm(col("v")) * norm(q)), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** Fetch a query vector (single row, scalar parameter) as doubles. */
  def queryVector(spark: SparkSession, df: DataFrame, idCol: String, id: Long, vecCol: String): Seq[Double] =
    df.filter(col(idCol) === id)
      .select(asDouble(col(vecCol)))
      .head().getSeq[Double](0)
}
