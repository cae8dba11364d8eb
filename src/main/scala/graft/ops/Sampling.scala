package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling and dataset mixing for training pipelines.
  *
  * `rand()`-based sampling changes under retries/re-partitioning;
  * content-hash bucketing is stable across runs, clusters and engines:
  * a row's bucket is a pure function of its key. The bucket is derived
  * from md5 hex characters via position lookup — deliberately portable
  * arithmetic (the same formula runs in any SQL engine for verification).
  */
object Sampling {

  private val HEX = "0123456789abcdef"

  /** Deterministic bucket in [0, 256): first two md5 hex chars of the key. */
  def hashBucket(key: Column): Column = {
    val h = md5(key.cast("string"))
    val c1 = instr(lit(HEX), substring(h, 1, 1)) - 1
    val c2 = instr(lit(HEX), substring(h, 2, 1)) - 1
    (c1 * 16 + c2).cast("int")
  }

  /** Keep ~`numerator`/256 of rows, chosen stably by key hash. */
  def hashSample(df: DataFrame, keyCol: String, numerator: Int): DataFrame =
    df.filter(hashBucket(col(keyCol)) < numerator)

  /** Stable train/validation split: rows with bucket < `valBuckets` go to
    * validation; the rest to train. Returns (train, val). */
  def trainValSplit(df: DataFrame, keyCol: String, valBuckets: Int): (DataFrame, DataFrame) = {
    val b = hashBucket(col(keyCol))
    (df.filter(b >= valBuckets), df.filter(b < valBuckets))
  }

  /** Mix sources with per-source sampling rates (numerators of 256) —
    * the weighted-mixture ingest of a training run, fully reproducible. */
  def mix(sources: Seq[(DataFrame, String, Int)]): DataFrame =
    sources.map { case (df, keyCol, numerator) =>
      hashSample(df, keyCol, numerator)
    }.reduce(_ unionByName _)

  /** Sequence packing: assign documents to fixed-token-capacity bins for
    * pretraining batch assembly. Greedy first-fit is inherently sequential;
    * the scalable relational form is contiguous fill — deterministic order
    * within a shard, exclusive running token sum, bin = ⌊cum/capacity⌋.
    * Sharding keeps the window partition-parallel (one running sum per
    * shard, never a global single-partition sort); bins are unique per
    * (shard, bin). A doc longer than `capacity` still lands in one bin —
    * flagged `oversize` for the caller to split upstream. */
  def packBins(
      df: DataFrame,
      tokensCol: String,
      capacity: Long,
      shardCol: String,
      orderCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol)).orderBy(col(orderCol))
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w).cast("long"))
      .withColumn("bin",
        floor((col("cum_tokens") - col(tokensCol)).cast("double") / capacity)
          .cast("long"))
      .withColumn("oversize", col(tokensCol) > capacity)
  }

  /** Stratified sampling: a per-stratum keep rate (numerator of 256),
    * applied with the same stable content-hash bucket as `hashSample` —
    * the standard rebalancing move for skewed training mixes (e.g. keep
    * 100% of low-resource languages, 10% of English). Rows in strata
    * absent from `rates` keep `defaultRate`/256. Pure scan-stage filter:
    * no shuffle, no state, retry-stable. */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      rates: Map[String, Int],
      defaultRate: Int = 0): DataFrame = {
    val rateExpr = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(strataCol) === lit(k), lit(v)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < rateExpr)
  }

  /** Temperature-scaled source mixing — the multilingual-training
    * convention (mBERT/XLM-R style exponent smoothing): sampled share of
    * stratum `s` ∝ (n_s)^alpha, realized as a per-row keep rate
    * r_s = (n_s / n_min)^(alpha-1) with the smallest stratum keeping
    * everything. `alpha = 1` reproduces the natural mix; `alpha → 0`
    * flattens toward uniform. Rates are integer bucket thresholds of 256
    * applied with the same stable content-hash bucket as [[hashSample]].
    *
    * Scale shape: one tiny per-stratum count aggregate (rows = #strata),
    * a 1-row global min, rates broadcast back onto the corpus — the
    * corpus itself is never shuffled, and the filter is scan-stage.
    * Returns the kept rows plus `n_s` and `rate` columns for accounting. */
  def temperatureMix(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"need 0 < alpha <= 1, got $alpha")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_s"))
    val minN = counts.agg(min(col("n_s")).as("n_min"))
    val rates = counts.crossJoin(broadcast(minN))
      .withColumn("rate",
        least(lit(256), greatest(lit(1),
          floor(pow(col("n_s").cast("double") / col("n_min"), alpha - 1.0) * 256 + 0.5)
            .cast("int"))))
      .select(col(strataCol), col("n_s"), col("rate"))
    df.join(broadcast(rates), Seq(strataCol))
      .filter(hashBucket(col(keyCol)) < col("rate"))
  }

  /** Fractional-epoch source upsampling — the LLaMA/GPT-3 mixture recipe
    * where source s is seen `epochs(s)` times per training pass, with
    * fractional epochs allowed (2.45 epochs of Wikipedia, 0.64 of CC).
    * Every row is replicated `floor(e)` times, and the stable
    * hash-fraction of rows covering the remainder gets one copy more;
    * e < 1 therefore downsamples, e > 1 upsamples, both reproducibly
    * (same content-hash bucket as [[hashSample]], quantized to /256 so
    * the selection is engine-portable integer math). Emitted copies carry
    * an `epoch_copy` replica index so a downstream [[shardShuffle]] keyed
    * on (key, epoch_copy) spreads them across shards.
    *
    * Scale shape: pure scan-stage — the epoch table is a literal CASE
    * (tiny, driver-side), the replication is a local array explode; no
    * shuffle, output volume = Σ_s e_s·|s| by construction. */
  def epochUpsample(
      df: DataFrame,
      keyCol: String,
      srcCol: String,
      epochs: Map[String, Double],
      defaultEpochs: Double = 1.0): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(_ >= 0), "epochs must be >= 0")
    def whole(e: Double): Int = math.floor(e).toInt
    def thr(e: Double): Int = math.floor((e - math.floor(e)) * 256 + 0.5).toInt
    val base = epochs.foldLeft(lit(whole(defaultEpochs))) { case (acc, (k, v)) =>
      when(col(srcCol) === k, lit(whole(v))).otherwise(acc)
    }
    val rem = epochs.foldLeft(lit(thr(defaultEpochs))) { case (acc, (k, v)) =>
      when(col(srcCol) === k, lit(thr(v))).otherwise(acc)
    }
    val copies = base + when(hashBucket(col(keyCol)) < rem, 1).otherwise(0)
    df.withColumn("epoch_copy",
      explode(when(copies >= 1, sequence(lit(1), copies))
        .otherwise(array().cast("array<int>"))))
  }

  /** Apply a target domain mixture to a corpus — the missing half of the
    * DoReMi loop ([[graft.ops.Curation.mixtureWeights]] learns the α
    * vector; this op RESAMPLES the corpus to it). Per domain d the target
    * copy count per row is `r_d = α_d · N · scale / n_d` (N total rows,
    * n_d the domain's rows): overweighted domains replicate
    * (floor(r) copies + a stable-hash extra with probability frac(r),
    * the [[epochUpsample]] remainder convention — thr = ⌊frac·256+½⌋
    * over the 256 md5 buckets), underweighted domains downsample by the
    * same rule (floor 0 + hash keep). Deterministic per key: the same
    * corpus resamples identically across runs, engines and retries.
    *
    * Unlike [[epochUpsample]] (caller-supplied literal rates) the rates
    * here derive from the DATA — two domain-sized partial aggs broadcast
    * back — so the thresholds are computed in-plan with the identical
    * double arithmetic an oracle can replicate.
    *
    * Scale shape: one groupBy(domain) partial agg + a 1-row total, both
    * broadcast onto the scan; explode multiplies only the surviving
    * rows. The corpus itself never shuffles.
    *
    * Output: input row × `mix_copy` (1-based replica index). */
  def applyMixture(
      df: DataFrame,
      keyCol: String,
      domainCol: String,
      alpha: Column,
      scale: Double = 1.0): DataFrame = {
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("__nd"))
    val total = df.agg(count(lit(1)).as("__n"))
    val r = alpha * col("__n").cast("double") * lit(scale) /
      col("__nd").cast("double")
    val base = floor(r).cast("int")
    val thr = floor((r - floor(r)) * 256 + lit(0.5)).cast("int")
    val copies = base + when(hashBucket(col(keyCol)) < thr, 1).otherwise(0)
    df.join(broadcast(counts), Seq(domainCol))
      .crossJoin(broadcast(total))
      .withColumn("mix_copy",
        explode(when(copies >= 1, sequence(lit(1), copies))
          .otherwise(array().cast("array<int>"))))
      .drop("__nd", "__n")
  }

  /** Stable uniform in (0, 1) from the first 6 md5 hex chars of the key —
    * a 24-bit value v mapped to (v + 0.5) / 2²⁴ (never exactly 0 or 1, so
    * ln() below is always finite). Same portable hex-char arithmetic as
    * [[hashBucket]]: any SQL engine reproduces it digit for digit. */
  def hashUniform(key: Column): Column = {
    val h = md5(key.cast("string"))
    val v = (0 until 6).map { i =>
      (instr(lit(HEX), substring(h, i + 1, 1)) - 1) *
        lit(math.pow(16, 5 - i).toLong)
    }.reduce(_ + _)
    (v.cast("double") + 0.5) / lit((1L << 24).toDouble)
  }

  /** Weighted sampling without replacement (Efraimidis & Spirakis 2006):
    * each row draws its stable uniform u and scores −ln(u)/w; the k
    * smallest scores are exactly a w-weighted draw of k rows. The usual
    * formulation (`rand()` keys) is retry-unstable and unverifiable;
    * hash-derived u makes the draw a pure function of the row key, so the
    * same k rows come back across runs, engines, and task retries.
    *
    * Scale shape: score is scan-stage column math; selection is a global
    * top-k (TakeOrderedAndProject — k rows per partition to the driver
    * merge, never a full sort). Weights must be strictly positive.
    *
    * Selection runs on the score QUANTIZED to 4 decimals of
    * score × `selectionScale` (key tiebreak) — ln() is engine-libm math
    * that can differ in the last ulp, and an unrounded top-k boundary
    * would ride on cross-engine transcendental parity; after quantizing,
    * near-ties at the boundary resolve by key identically everywhere
    * (the repo's round-before-selection convention). `es_score` itself is
    * emitted raw. */
  def weightedSample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      k: Int,
      selectionScale: Double = 1000.0): DataFrame =
    df.withColumn("es_score", -log(hashUniform(col(keyCol))) / col(weightCol))
      .withColumn("es_rank", round(col("es_score") * lit(selectionScale), 4))
      .orderBy(col("es_rank"), col(keyCol))
      .limit(k)
      .drop("es_rank")

  /** Hash-ring negative sampling — deterministic "random" negatives for
    * contrastive / retrieval training pairs: each anchor takes the next
    * `k` documents in md5-ring order as negatives. Hash order is
    * content-independent, so ring neighbors are an unbiased draw, yet the
    * assignment is a pure function of (seed, id): reproducible across
    * runs, engines and task retries, re-drawable by changing the seed —
    * the same determinism contract as [[hashSample]] (`rand()` negatives
    * survive neither retries nor verification).
    *
    * Scale shape: the ring is BUCKETED (`numBuckets` hash buckets,
    * wrap-around within bucket) so ordering is a partition-parallel
    * window, never a global single-partition sort; negatives come from a
    * bucket-keyed equi self-join. Buckets are hash-uniform — skew-free by
    * construction. A bucket with ≤ k docs yields fewer negatives (the
    * wrap-around meets the anchor and self-pairs are dropped); size
    * numBuckets so expected bucket occupancy ≫ k.
    *
    * Output: (anchor_id, i ∈ 1..k, neg_id). */
  def ringNegatives(
      df: DataFrame,
      idCol: String,
      k: Int,
      seed: String,
      numBuckets: Int = 64): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val salted = concat(lit(seed), lit(":"), col(idCol).cast("string"))
    val ring = df
      .select(col(idCol).as("id"), md5(salted).as("h"),
        pmod(hashBucket(salted), lit(numBuckets)).as("bkt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bkt")).orderBy(col("h"), col("id"))
    val pos = ring
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bkt"))))
    val anchors = pos
      .select(col("id").as("anchor_id"), col("bkt"), col("rn"), col("cnt"),
        explode(sequence(lit(1), lit(k))).as("i"))
      .withColumn("target_rn", pmod(col("rn") - 1 + col("i"), col("cnt")) + 1)
    anchors
      .join(pos.select(col("bkt"), col("rn").as("target_rn"),
        col("id").as("neg_id")), Seq("bkt", "target_rn"))
      .filter(col("neg_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("i"), col("neg_id"))
  }

  /** Leakage-safe train/validation split: the split decision is a pure
    * function of a GROUP key (content hash, near-dup cluster id) instead
    * of the row, so every member of a duplicate group lands on the same
    * side — the standard guard against train/test contamination that a
    * row-keyed split cannot give (an exact duplicate of a validation doc
    * in train is memorized leakage). Pass `md5(text)` for exact-dup
    * safety (zero shuffle — pure scan-stage column math) or a cluster id
    * from [[graft.dedup.Dedup.clusters]] for near-dup safety. */
  def leakageSafeSplit(
      df: DataFrame, groupKey: Column, valBuckets: Int): DataFrame = {
    require(valBuckets >= 0 && valBuckets <= 256,
      s"valBuckets in [0,256], got $valBuckets")
    df.withColumn("split",
      when(hashBucket(groupKey) < valBuckets, lit("val")).otherwise(lit("train")))
  }

  /** Deterministic global shuffle into training shards: shard and
    * within-shard position are pure functions of (seed, key), so an epoch's
    * read order reproduces across runs, clusters and task retries — what
    * `rand()`-ordered repartition cannot give. New seed → new permutation.
    *
    * Scale shape: ONE shuffle, partitioned by shard with a per-shard sort
    * on the key hash (never a global sort). Choose numShards ≫ executors
    * so each shard's sort fits in memory at the target corpus size. */
  def shardShuffle(
      df: DataFrame,
      keyCol: String,
      seed: String,
      numShards: Int): DataFrame = {
    val salted = concat(lit(seed), lit(":"), col(keyCol).cast("string"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("h"), col(keyCol))
    df.withColumn("h", md5(salted))
      .withColumn("shard", pmod(hashBucket(salted), lit(numShards)))
      .withColumn("pos", row_number().over(w).cast("long"))
  }
}
