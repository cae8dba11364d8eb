package graft.sim

import graft.plans.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011): split each d-dim vector into m
  * subspaces, quantize every sub-vector to one of k codebook centroids,
  * and search with asymmetric distance (ADC) — the query stays exact and
  * per-candidate distance is m table lookups instead of d multiplies.
  * A d=64 float vector becomes m=4 bytes of codes: 64× less memory/IO —
  * the technique that makes billion-vector indexes fit a cluster.
  *
  * Scale shape: encoding is scan-stage (one constant-plan-size argmin
  * expression per subspace — same NearestCentroid machinery as IVF);
  * the ADC lookup tables are m·k doubles computed driver-side from the
  * query (microseconds) and inlined as literal arrays, so search is one
  * scan + TakeOrderedAndProject. Nothing shuffles.
  *
  * The codebook here is the deterministic first-k-by-id choice (exactly
  * the convention `Ann.ivfBuild` established for oracle reproducibility);
  * production training swaps in `Ann.kmeansCentroids` per subspace
  * without changing any downstream shape.
  */
object Pq {

  /** Per-subspace codebooks: codes(s) = Seq of (code id, sub-centroid). */
  final case class Codebook(m: Int, subDim: Int, codes: Seq[Seq[(Long, Seq[Double])]])

  /** Deterministic codebook: the first k vectors by id supply the
    * centroids of every subspace (scalar parameter fetch — k rows). */
  def fixedCodebook(
      df: DataFrame, idCol: String, vecCol: String, m: Int, k: Int): Codebook = {
    // normalize to double BEFORE collecting (array<float> and
    // array<double> vector columns both accepted — the Ann convention)
    val rows = df.orderBy(col(idCol)).limit(k)
      .select(transform(col(vecCol), _.cast("double"))).collect()
      .map(_.getSeq[Double](0).toSeq)
    require(rows.length == k,
      s"codebook needs k=$k source rows, got ${rows.length} — a silently " +
        "shrunken codebook yields wrong-but-plausible codes")
    val d = rows.head.length
    require(rows.forall(_.length == d),
      s"ragged vector lengths in codebook source (expected $d)")
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val subDim = d / m
    val codes = (0 until m).map { s =>
      rows.zipWithIndex.map { case (v, j) =>
        (j.toLong, v.slice(s * subDim, (s + 1) * subDim))
      }.toSeq
    }
    Codebook(m, subDim, codes)
  }

  /** Trained codebooks (Jégou et al. §III-A): per-subspace Lloyd k-means
    * via [[Ann.kmeansCentroids]] over the sliced sub-vectors, centroids
    * renumbered 0..k-1 (ADC LUT indexing is positional). Training cost is
    * m small k-means runs; each round's only shuffle carries (cid, dim)
    * partial sums — k × subDim rows, independent of corpus size — so
    * training at 100 TB is m·iters cheap aggregation passes. Swaps into
    * every downstream shape ([[encode]], [[adcTopK]], [[ivfPqTopK]])
    * unchanged. */
  def trainedCodebook(
      df: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, iters: Int): Codebook = {
    // same shrunken-codebook guard as fixedCodebook: k-means seeds from
    // the first k rows, so fewer than k source rows would silently yield
    // a smaller codebook with wrong-but-plausible codes
    require(df.limit(k).count() == k,
      s"codebook training needs at least k=$k source rows")
    val d = df.select(size(col(vecCol))).head().getInt(0)
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val subDim = d / m
    val codes = (0 until m).map { s =>
      Ann.kmeansCentroids(
        df.select(col(idCol), slice(col(vecCol), s * subDim + 1, subDim).as("sub")),
        idCol, "sub", k, iters)
        .sortBy(_._1).zipWithIndex
        .map { case ((_, c), j) => (j.toLong, c) }.toSeq
    }
    Codebook(m, subDim, codes)
  }

  /** Scan-stage encoding: code_s = argmin_j L2(sub-vector, codebook_j)
    * (ties → lowest code, matching the relational formulation). Appends
    * columns code_0 .. code_{m-1}. */
  def encode(df: DataFrame, vecCol: String, cb: Codebook): DataFrame =
    (0 until cb.m).foldLeft(df) { (acc, s) =>
      acc.withColumn(s"code_$s",
        VectorFunctions.nearestCentroid(
          slice(col(vecCol), s * cb.subDim + 1, cb.subDim), cb.codes(s)))
    }

  /** ADC distance column for `query` over encoded rows: Σ_s lut_s[code_s],
    * with the m·k lookup tables inlined as literal arrays. L2 uses
    * [[Ann.l2sqLocal]] — the one accumulation-order definition shared
    * with every other centroid path (oracle parity). */
  def adcDistance(query: Seq[Double], cb: Codebook): Column = {
    require(query.length == cb.m * cb.subDim, "query/codebook dim mismatch")
    (0 until cb.m).map { s =>
      val qSub = query.slice(s * cb.subDim, (s + 1) * cb.subDim)
      val lut = cb.codes(s).sortBy(_._1).map { case (_, c) => Ann.l2sqLocal(qSub, c) }
      element_at(array(lut.map(lit): _*), col(s"code_$s").cast("int") + 1)
    }.reduce(_ + _)
  }

  /** Top-k by asymmetric distance: encode → lookup-sum → sort+limit on
    * the ROUNDED distance (id tiebreak) so the selection boundary is
    * engine-exact. */
  def adcTopK(
      df: DataFrame, idCol: String, vecCol: String,
      cb: Codebook, query: Seq[Double], k: Int): DataFrame =
    encode(df, vecCol, cb)
      .withColumn("adc_dist", round(adcDistance(query, cb), 4))
      .orderBy(col("adc_dist"), col(idCol))
      .limit(k)
      .select(col(idCol), col("adc_dist"))

  /** IVF-PQ: the standard billion-scale layout — the coarse (IVF)
    * quantizer prunes to `nprobe` cells via a pushed-down `cid IN`
    * filter over the materialized index, and the product codes score
    * the survivors by ADC. Scans nprobe/nlist of the corpus AND touches
    * m bytes per candidate instead of d floats. */
  def ivfPqTopK(
      index: Ann.IvfIndex, cb: Codebook, query: Seq[Double],
      nprobe: Int, k: Int): DataFrame = {
    val probed = Ann.probeCells(index.centroids, query, nprobe)
    encode(index.assigned.filter(col("cid").isin(probed: _*)), "v", cb)
      .withColumn("adc_dist", round(adcDistance(query, cb), 4))
      .orderBy(col("adc_dist"), col("id"))
      .limit(k)
      .select(col("id").as("vec_id"), col("adc_dist"))
  }
}
