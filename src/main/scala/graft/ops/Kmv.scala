package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable KMV (k-minimum-values) distinct-count sketch — Bar-Yossef,
  * Jayram, Kumar, Sivakumar, Trevisan (RANDOM 2002); the bottom-k /
  * theta-sketch family's simplest member and [[Hll]]'s complement: where
  * HLL keeps 256 1-byte registers, KMV keeps the k smallest distinct
  * hash values, which doubles as a uniform bottom-k SAMPLE of the
  * distinct keys (set expressions — intersection/union estimates — come
  * free from comparing two groups' kept sets; HLL registers can't do
  * that).
  *
  * Portability: keys hash through the repo's md5 convention, truncated
  * to 48 hex-aligned bits — 2⁴⁸ < 2⁵³, so the k-th minimum casts to
  * double EXACTLY and the estimate `(k−1)·2⁴⁸ / h_k` (the unbiased KMV
  * estimator) is one exact product and one division on both engines: any
  * SQL engine reproduces the kept set AND the estimate digit for digit.
  * Collision odds at 48 bits are n²/2⁴⁹ — negligible below 10⁷ distinct
  * keys per group; for more, raise k and the hex width together.
  *
  * Scale shape: the sketch state is [[graft.plans.MinKDistinct]] — a
  * k-bounded sorted-set TypedImperativeAggregate, so at most k longs per
  * group per partition cross the exchange and the merge (set-union,
  * re-cap at k) IS the KMV union. The window formulation would shuffle
  * and sort every distinct hash instead.
  *
  * Exact-below-k property: with fewer than k distinct keys the kept set
  * is all of them and the estimate is their exact count — the sketch
  * degrades to exact counting, which the gate pins per group.
  */
object Kmv {

  /** 2⁴⁸ as an exact double literal (power of two). */
  private val Scale48 = 281474976710656.0

  /** 48-bit md5 value hash, hex-aligned: first 12 hex chars. */
  def h48(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 12), 16, 10).cast("long")

  /** Distinct-count estimate of `key` per `groups`: one row per group
    * with (n_kept, est_distinct). `est_distinct` = exact count when the
    * group holds < k distinct keys, else floor((k−1)·2⁴⁸ / h_k). */
  def distinctEstimate(
      df: DataFrame, key: Column, groups: Seq[Column],
      k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val kept = df.groupBy(groups: _*)
      .agg(graft.plans.MinKDistinct.minKDistinct(h48(key), k).as("ks"))
    // (k−1)·2⁴⁸ is exact for any sensible k: 2⁴⁸ is a power of two, so
    // the product's mantissa is just k−1 (exact while k−1 < 2⁵³)
    val num = lit((k - 1).toDouble * Scale48)
    kept.select(
      (groups.indices.map(i => col(kept.columns(i))) :+
        size(col("ks")).cast("long").as("n_kept") :+
        when(size(col("ks")) < k, size(col("ks")).cast("long"))
          .otherwise(floor(num / element_at(col("ks"), k).cast("double"))
            .cast("long"))
          .as("est_distinct")): _*)
  }

  /** Sketch-level SET ALGEBRA between every pair of groups — the theta-
    * sketch trick (Beyer et al., SIGMOD 2007) KMV buys over HLL: for
    * groups A, B with bottom-k sets Kᴬ, Kᴮ,
    *
    *   K = bottom-k(Kᴬ ∪ Kᴮ) is a valid KMV sketch of A∪B
    *   ⇒ |A∪B|̂ from K's k-th minimum (exact when |K| < k)
    *   Ĵ = |{x ∈ K : x ∈ Kᴬ ∧ x ∈ Kᴮ}| / |K|   (Jaccard)
    *   |A∩B|̂ = Ĵ · |A∪B|̂
    *
    * so pairwise overlap between, say, per-source vocabularies needs NO
    * second corpus scan — only the |groups|-row sketch table, self-
    * joined pairwise (|groups|²/2 rows of k-bounded array math; the
    * sketch table broadcasts). All arithmetic is the exact md5₄₈ lane —
    * any engine reproduces every kept set, estimate and Jaccard digit
    * for digit; below k everything degrades to EXACT set algebra.
    *
    * Output per unordered pair (ga < gb): n_union_kept, union_est,
    * inter_est, jaccard (fl4). */
  def setEstimates(
      df: DataFrame, key: Column, groupCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val sk = df.groupBy(col(groupCol))
      .agg(graft.plans.MinKDistinct.minKDistinct(h48(key), k).as("ks"))
    val a = sk.select(col(groupCol).as("ga"), col("ks").as("ka"))
    val b = sk.select(col(groupCol).as("gb"), col("ks").as("kb"))
    val num = lit((k - 1).toDouble * Scale48)
    a.join(broadcast(b), col("ga") < col("gb"))
      .withColumn("ku",
        slice(array_sort(array_distinct(concat(col("ka"), col("kb")))), 1, k))
      .withColumn("nu", size(col("ku")))
      .withColumn("nboth",
        size(filter(col("ku"), x =>
          array_contains(col("ka"), x) && array_contains(col("kb"), x))))
      .withColumn("union_est",
        when(col("nu") < k, col("nu").cast("long"))
          .otherwise(floor(num / element_at(col("ku"), k).cast("double"))
            .cast("long")))
      .select(col("ga"), col("gb"),
        col("nu").cast("long").as("n_union_kept"),
        col("union_est"),
        floor(col("nboth").cast("double") * col("union_est").cast("double")
          / col("nu").cast("double")).cast("long").as("inter_est"),
        (floor(col("nboth").cast("double") / col("nu").cast("double")
          * 10000 + lit(0.5)) / 10000).as("jaccard"))
  }
}
