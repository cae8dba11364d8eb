package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Portable mergeable quantile sketch — an HDR-histogram (Tene,
  * HdrHistogram; same log-bucket family as DDSketch, Masson et al. VLDB
  * 2019) over non-negative integer values, built from EXACT integer bit
  * math so any SQL engine reproduces every bucket and every quantile
  * estimate digit for digit (the same portability move as [[Hll]] /
  * [[Cms]] / [[Bloom]]: approximate algorithm, exact cross-engine gate).
  *
  * Bucketing: a value keeps its top `1 + subBits` significant bits —
  * `shift = max(bitlen(v) − 1 − subBits, 0)`, bucket = `(v >> shift) <<
  * shift`. The bucket IS its own lower bound (canonical id, no decode
  * table), values below 2^(subBits+1) are exact, and the relative error
  * of any estimate is < 2^−subBits (default 3 → 12.5%; subBits=6 → 1.6%).
  * `bitlen` is `length(bin(v))` — exact in Spark and DuckDB alike; no
  * float log anywhere, so there is no last-ulp bucket-flip risk.
  *
  * Scale shape: the sketch is `groupBy(groups :+ bucket).count` — a
  * partial-aggregatable histogram whose map-side size is bounded by the
  * bucket count (≤ (64−subBits)·2^subBits ≈ 500 at subBits=3) REGARDLESS
  * of row count, which is the mergeable-sketch property: partition
  * histograms merge by adding counts, exactly how t-digest/DDSketch
  * unions work but with deterministic results. The quantile pick then
  * runs over ≤500 rows per group (cumulative window inside the group's
  * bucket list — bounded, never corpus-sized).
  *
  * Estimate: for each q, the smallest bucket whose cumulative count
  * reaches `ceil(q · total)` — the lower bound of the bucket holding the
  * rank-⌈qN⌉ value (a conservative, order-statistics-exact rule: the true
  * quantile lies in [bucket, bucket·(1+2^−subBits))).
  */
object Quantiles {

  /** HDR bucket (= lower bound) of a non-negative BIGINT column. */
  def hdrBucket(v: Column, subBits: Int): Column = {
    require(subBits >= 1 && subBits <= 16, s"subBits in [1,16], got $subBits")
    val m = length(bin(v)) // bitlen; bin(0)='0' → 1, harmless (shift 0)
    val sh = greatest(m - lit(1 + subBits), lit(0)).cast("int")
    // shiftright/shiftleft accept column shift amounts (ShiftRight(l, r))
    call_function("shiftleft", call_function("shiftright", v, sh), sh)
  }

  /** Mergeable histogram: groups ++ (bucket, n). This is the sketch —
    * persist/union tables of these rows and re-aggregate by sum(n). */
  def sketch(
      df: DataFrame, value: Column, groups: Seq[Column],
      subBits: Int = 3): DataFrame =
    df.groupBy(groups :+ hdrBucket(value, subBits).as("bucket"): _*)
      .agg(count(lit(1)).as("n"))

  /** Quantile estimates per group, long format: groups ++ (q, estimate).
    * `value` must be a non-negative integral column (callers floor/cast
    * explicitly — Spark truncates and DuckDB rounds on double→bigint
    * casts, so an implicit cast would break the cross-engine gate). */
  def quantiles(
      df: DataFrame, value: Column, groups: Seq[Column],
      qs: Seq[Double], subBits: Int = 3): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must be in (0, 1], got $qs")
    val counts = sketch(df, value, groups, subBits)
    val gcols = counts.columns.dropRight(2).map(col)
    // ungrouped sketches still have ≤ bucket-count rows — a constant
    // partition key is the documented-bounded case (see BoundedWindow)
    val part: Seq[Column] = if (gcols.nonEmpty) gcols.toSeq else Seq(lit(0))
    val cum = counts
      .withColumn("cum",
        sum(col("n")).over(Window.partitionBy(part: _*).orderBy(col("bucket"))))
      .withColumn("total",
        sum(col("n")).over(Window.partitionBy(part: _*)))
    cum
      .select(gcols :+ col("bucket") :+ col("cum") :+ col("total") :+
        explode(array(qs.map(lit): _*)).as("q"): _*)
      .filter(col("cum") >= ceil(col("q") * col("total")))
      .groupBy(gcols :+ col("q"): _*)
      .agg(min(col("bucket")).as("estimate"))
  }

  /** Sketch-driven equi-depth binning: per group, `nBins` bins bounded by
    * the q = i/nBins quantile estimates, then per-bin row count and exact
    * value min/max. The textbook two-pass shape for 100 TB feature
    * binning: pass 1 builds the bounded sketch (≤ ~500·2^(subBits−3) rows
    * per group however large the corpus), the ≤ nBins−1 integer
    * boundaries per group broadcast back, and pass 2 assigns bins in the
    * SCAN STAGE (a higher-order fold over the boundary array — no join
    * explosion, no per-row window) before one partial-aggregatable stats
    * aggregate. A global-sort `ntile` would shuffle and totally order the
    * corpus instead — the classic scale-killer this op replaces.
    *
    * bin(v) = #{boundaries b : v > b} ∈ [0, nBins−1]; coarse sketch
    * buckets can collapse adjacent boundaries, leaving some bins empty
    * (absent from the output) — raise subBits for finer boundaries.
    * All-integer boundaries and values → deterministic cross-engine. */
  def equiDepthBins(
      df: DataFrame, value: Column, groupCols: Seq[String], nBins: Int,
      subBits: Int = 6): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, s"nBins in [2,1000], got $nBins")
    val qs = (1 until nBins).map(i => i.toDouble / nBins)
    val src = df.select(groupCols.map(col) :+ value.as("v"): _*)
    val bounds = quantiles(src, col("v"), groupCols.map(col), qs, subBits)
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("q"), col("estimate"))))
        .as("bq"))
      .select(groupCols.map(col) :+
        transform(col("bq"), e => e.getField("estimate")).as("bl"): _*)
    src.join(broadcast(bounds), groupCols)
      .withColumn("bin", aggregate(col("bl"), lit(0),
        (acc, b) => acc + when(col("v") > b, 1).otherwise(0)).cast("long"))
      .groupBy(groupCols.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("n_rows"),
        min(col("v")).as("v_min"), max(col("v")).as("v_max"))
  }
}
