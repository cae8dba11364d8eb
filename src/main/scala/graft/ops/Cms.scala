package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005)
  * — sub-linear frequency estimation with a one-sided error guarantee:
  * estimate ≥ true count always, and ≤ true + εN with probability 1−δ
  * (ε = e/w, δ = e^−d).
  *
  * Like [[Hll]], the lane hashes derive from md5 (lane-salted:
  * `md5(lane ':' key)`), so any SQL engine reproduces every counter and
  * every estimate digit for digit and the correctness gate can
  * hash-compare the sketch — Spark's own sketch aggregates hash with
  * engine-private functions and can only be rows-only checked.
  *
  * Scale shape: the sketch is `groupBy(lane, bucket).count` over the
  * lane-exploded stream — partial-aggregatable, which IS the CMS merge
  * property (counter matrices merge by +, exactly how partial counts
  * combine), so the map side collapses each partition to ≤ d·w rows
  * before the one tiny exchange. The materialized sketch is d·w rows
  * (1 Ki at the defaults) regardless of stream size — it broadcasts for
  * estimate joins, and the explode factor d on the update side is the
  * textbook d hash probes per arrival. Point estimates never touch the
  * raw stream again: probes join the broadcast sketch on (lane, bucket)
  * and take the integer min over lanes — exact, order-free arithmetic
  * end to end (no floats anywhere in the sketch).
  *
  * w is fixed at 256 (bucket = first two md5 hex chars, hex-digit-aligned
  * for cross-engine SQL); d defaults to 4 → ε = e/256 ≈ 1.1%·N, δ ≈ 1.8%.
  */
object Cms {

  val W = 256

  /** Lane-salted bucket for one key: first 2 hex chars of
    * `md5(lane ':' key)` as an integer in [0, 256). */
  private def bucket(lane: Column, key: Column): Column =
    conv(substring(md5(concat(lane.cast("string"), lit(":"),
      key.cast("string"))), 1, 2), 16, 10).cast("long")

  /** Build the d×256 counter matrix over the key stream (one row per
    * arrival — duplicates are what the sketch counts). Output:
    * (lane: long, bucket: long, cnt: long), ≤ d·256 rows. */
  def sketch(df: DataFrame, key: Column, d: Int = 4): DataFrame = {
    require(d >= 1 && d <= 16, s"d must be in [1, 16], got $d")
    df.select(key.as("k"))
      .select(explode(sequence(lit(0), lit(d - 1))).as("lane"), col("k"))
      .select(col("lane").cast("long"), bucket(col("lane"), col("k")).as("bucket"))
      .groupBy(col("lane"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the frequency of each probe key: min over the d lane
    * counters. `probes` must carry a distinct key column named `keyCol`;
    * all its other columns pass through. The sketch side is ≤ d·256 rows
    * and is broadcast — the probe relation never shuffles. A probe whose
    * bucket row is absent (nothing ever hashed there) reads 0. */
  def estimate(
      sketchDf: DataFrame, probes: DataFrame, keyCol: String,
      d: Int = 4): DataFrame = {
    require(d >= 1 && d <= 16, s"d must be in [1, 16], got $d")
    val probeLanes = probes
      .select((probes.columns.map(col) :+
        explode(sequence(lit(0L), lit(d - 1L))).as("lane")): _*)
      .withColumn("bucket", bucket(col("lane"), col(keyCol)))
    val passThrough = probes.columns.map(col)
    probeLanes
      .join(broadcast(sketchDf), Seq("lane", "bucket"), "left")
      .groupBy(passThrough: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
