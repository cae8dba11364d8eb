package graft.sim

import graft.plans.{VecGram, VecMean}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA over an embedding column — the whitening / dimensionality-
  * reduction step embedding pipelines run before clustering or ANN
  * (e.g. SemDeDup-style preprocessing).
  *
  * Spark-first shape (the k-means/CC small-state pattern): ONE scan
  * computes the sufficient statistics — count, mean ([[VecMean]]) and
  * Gram matrix Σ v·vᵀ ([[VecGram]], a d²-double partial-aggregatable
  * buffer) — in a single aggregate; the d×d covariance and its top-k
  * eigenvectors are then driver math (power iteration with deflation on
  * a 64×64 matrix — microseconds, no linalg dependency); projection back
  * over the corpus is a scan-stage fused dot-product per component. The
  * corpus is read twice (fit, transform) and never shuffled.
  */
object Pca {

  final case class Model(
      mean: Array[Double],
      components: Array[Array[Double]], // row-major, unit-norm, variance-ordered
      variances: Array[Double])

  /** Fit top-k principal components. */
  def fit(df: DataFrame, vecCol: String, k: Int,
      iters: Int = 100, seedTol: Double = 1e-9): Model = {
    val row = df.agg(
      VecMean.vecMean(col(vecCol)).as("mean"),
      VecGram.vecGram(col(vecCol)).as("gram"),
      count(col(vecCol)).as("n")).collect()(0)
    require(row.getLong(2) > 0 && !row.isNullAt(0) && !row.isNullAt(1),
      s"Pca.fit: no non-null '$vecCol' rows to fit on")
    val mean = row.getSeq[Double](0).toArray
    val gram = row.getSeq[Double](1).toArray
    val n = row.getLong(2).toDouble
    val d = mean.length
    // cov = gram/n − mean·meanᵀ
    val cov = Array.tabulate(d, d)((i, j) => gram(i * d + j) / n - mean(i) * mean(j))
    val comps = new Array[Array[Double]](k.min(d))
    val vars = new Array[Double](k.min(d))
    var c = 0
    while (c < comps.length) {
      // deterministic start: basis vector with max diagonal remaining
      val seedIdx = argmaxDiag(cov)
      var v = Array.tabulate(d)(i => if (i == seedIdx) 1.0 else 1e-4)
      var it = 0
      var converged = false
      while (it < iters && !converged) {
        val w = matVec(cov, v)
        val nw = norm(w)
        if (nw < seedTol) { converged = true } // null space: stop
        else {
          val vNew = w.map(_ / nw)
          if (math.abs(math.abs(dot(vNew, v)) - 1.0) < seedTol) converged = true
          v = vNew
        }
        it += 1
      }
      val lambda = dot(v, matVec(cov, v))
      comps(c) = v
      vars(c) = lambda
      // deflate: cov ← cov − λ v vᵀ
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { cov(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
      c += 1
    }
    Model(mean, comps, vars)
  }

  /** Project vectors onto the model's components: adds `outCol` =
    * array(k) of coordinates in PCA space. Scan-stage only. */
  def transform(df: DataFrame, vecCol: String, model: Model, outCol: String): DataFrame = {
    val centered: Column = {
      val m = array(model.mean.map(lit): _*)
      zip_with(col(vecCol).cast("array<double>"), m, (a, b) => a - b)
    }
    val coords = model.components.map { comp =>
      aggregate(
        zip_with(centered, array(comp.map(lit): _*), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
    }
    df.withColumn(outCol, array(coords: _*))
  }

  private def argmaxDiag(m: Array[Array[Double]]): Int = {
    var best = 0; var i = 1
    while (i < m.length) { if (m(i)(i) > m(best)(best)) best = i; i += 1 }
    best
  }
  private def matVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
    m.map(row => dot(row, v))
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def norm(a: Array[Double]): Double = math.sqrt(dot(a, a))
}
