package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation gates ABOVE single-document granularity. Per-doc filters
  * (quality score, repetition, PII) live in `graft.functions`; these
  * operators aggregate evidence across a whole source/domain and keep or
  * drop documents wholesale — the RefinedWeb/C4 "bad neighborhood" step a
  * per-row filter cannot express.
  */
object Curation {

  /** Domain-level quality gate: a document survives iff its source clears
    * BOTH a mean-quality floor and a minimum document count (tiny sources
    * carry too little evidence to trust their mean either way).
    *
    * Scale shape: pass 1 is a partial-aggregatable (sum, count) per source —
    * the shuffle carries one row per source per map partition, and the
    * result is one row per DOMAIN (orders of magnitude smaller than the
    * corpus); pass 2 broadcasts that verdict table back as an equi-join, so
    * the corpus itself is never shuffled. At 100 TB: two scans (score+agg,
    * score+join — both pure scan-stage work that parallelizes linearly), a
    * tiny agg, a broadcast join; no repartition of document data at any
    * point. If the score is expensive, persist the scored relation or
    * compute verdicts from a per-source sample — the gate only needs the
    * mean.
    *
    * The gate compares on the 4-decimal-floored mean (`r4`-style, matching
    * `functions.r4ratio`) so the survivor set is bit-stable across summation
    * orders and engines.
    */
  def sourceQualityGate(
      df: DataFrame,
      srcCol: String,
      score: Column,
      minMean: Double,
      minDocs: Long): DataFrame = {
    val scored = df.withColumn("doc_quality", score)
    val verdicts = scored
      .groupBy(col(srcCol))
      .agg(
        (floor(avg(col("doc_quality")) * 10000 + lit(0.5)) / 10000).as("src_mean_quality"),
        count(lit(1)).as("src_docs"))
      .filter(col("src_mean_quality") >= minMean && col("src_docs") >= minDocs)
    scored.join(broadcast(verdicts), Seq(srcCol))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", unigram feature space):
    * score every document by how target-like its token distribution is —
    * `weight(d) = Σ_tokens log P̂_target(w) / P̂_raw(w)` with add-1
    * smoothing over the union vocabulary; words unseen on either side get
    * the smoothed unseen ratio. Rank by weight (or hash-resample on it)
    * to select raw-corpus documents that look like the target domain.
    *
    * Scale shape: the two unigram language models are partial-aggregatable
    * word counts whose result is VOCABULARY-sized (Zipf: independent of
    * corpus size, same argument as `bpePairStats`), broadcast back onto
    * the exploded token stream; the per-doc sum then shuffles one
    * (doc_id, partial-sum) row per map partition — uniform key, no skew.
    * The corpus text itself crosses no exchange.
    *
    * Output: one row per input doc — doc_id, n_toks, dsir_weight
    * (4-decimal-floored, summation-order-stable). */
  def dsirWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column): DataFrame = {
    val toks = df.select(
      col(idCol).as("doc_id"), isTarget.as("__t"),
      explode(split(trim(col(textCol)), "\\s+")).as("w"))
    // vocabulary-sized: per-word counts on each side
    val wordCounts = toks.groupBy(col("w")).agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("c_t"),
      sum(when(col("__t"), 0L).otherwise(1L)).as("c_r"))
      .localCheckpoint(true)
    // smoothing constants: side totals + union vocab size (one tiny row)
    val consts = wordCounts.agg(
      sum(col("c_t")).as("n_t"), sum(col("c_r")).as("n_r"),
      count(lit(1)).as("v"))
    val ratios = wordCounts.crossJoin(broadcast(consts))
      .select(col("w"),
        (log((col("c_t") + 1).cast("double") / (col("n_t") + col("v")).cast("double"))
          - log((col("c_r") + 1).cast("double") / (col("n_r") + col("v")).cast("double")))
          .as("lr"))
    toks.join(broadcast(ratios), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        (floor(sum(col("lr")) * 10000 + lit(0.5)) / 10000).as("dsir_weight"))
  }

  /** Bigram-LM perplexity scoring (the CCNet quality signal, Wenzek et
    * al. 2020, with an in-corpus bigram model instead of KenLM): per doc,
    * `ppl = exp(-Σ ln P(w2|w1) / n_bigrams)` with add-1-smoothed bigram
    * probabilities `P(w2|w1) = (c(w1,w2)+1) / (c(w1·)+V)` estimated from
    * the corpus itself. Low perplexity ≈ fluent/common phrasing; high ≈
    * boilerplate soup or noise. Filter or stratify on it as CCNet does.
    *
    * Scale shape: like [[dsirWeights]] the count tables are partial aggs
    * rejoined onto the doc's bigram stream, but unlike the unigram case
    * the bigram-TYPE table is NOT vocabulary-bounded — distinct bigrams
    * grow near-linearly with corpus size (Heaps' law), so the rejoin is
    * left to AQE (broadcast when the model fits, shuffle join when it
    * doesn't) rather than force-broadcast. A production CCNet setup
    * prunes the table (min-count / top-K with backoff) before scoring;
    * here the unpruned model keeps the oracle exact. The per-doc sum
    * still shuffles one partial row per map partition. Docs with fewer
    * than two tokens have no bigrams and are absent from the output.
    *
    * Output: doc_id, n_bigrams, ppl (4-decimal-floored). */
  def bigramPerplexity(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      split(trim(col(textCol)), "\\s+").as("__t"))
    val bigrams = toks
      .select(col("doc_id"),
        explode(when(size(col("__t")) >= 2,
            transform(sequence(lit(0), size(col("__t")) - 2),
              i => struct(element_at(col("__t"), i + 1).as("w1"),
                element_at(col("__t"), i + 2).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("__b"))
      .select(col("doc_id"), col("__b.w1").as("w1"), col("__b.w2").as("w2"))
      // two consumers (the bigram-count aggregation AND the per-doc
      // scoring join): materialize the exploded relation once instead of
      // re-tokenizing the corpus for each (round 19; lazy — it first
      // runs inside whichever consumer's job fires first)
      .localCheckpoint(false)
    val bc = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .localCheckpoint(true)
    val hc = bc.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val vocabSize = toks
      .select(explode(col("__t")).as("w")).agg(countDistinct(col("w")).as("v"))
    val probs = bc.join(hc, "w1").crossJoin(broadcast(vocabSize))
      .select(col("w1"), col("w2"),
        log((col("c12") + 1).cast("double") / (col("c1") + col("v")).cast("double"))
          .as("lp"))
    bigrams.join(probs, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (floor(exp(-sum(col("lp")) / count(lit(1))) * 10000 + lit(0.5)) / 10000)
          .as("ppl"))
  }

  /** C4 line-rule battery + page gate (Raffel et al. 2020, §2.2): keep a
    * line iff it has at least `minWords` words, contains none of
    * `lineBanned`, and (optionally) ends in terminal punctuation; drop the
    * whole page if any line contains a `pageBanned` marker (C4: "lorem
    * ipsum", "{") or fewer than `minLines` lines survive. Returns one row
    * per input doc — cleaned text, kept/dropped line counts, and the
    * page-level verdict — so callers can either filter on `page_keep` or
    * audit the battery's effect.
    *
    * Scale shape: the entire battery is per-document array math —
    * higher-order `filter`/`exists` over the lines array fused into the
    * scan. No explode, no join, no shuffle of any kind; at 100 TB this is
    * one linear pass. (Contrast lineDedup, which is inherently global.)
    */
  def c4LineFilter(
      df: DataFrame,
      idCol: String,
      linesCol: Column,
      minWords: Int,
      minLines: Int,
      lineBanned: Seq[String],
      pageBanned: Seq[String],
      requireTerminalPunct: Boolean = false): DataFrame = {
    val lineOk: Column => Column = l => {
      val words =
        size(filter(split(l, "\\s+"), w => length(w) > 0)) >= minWords
      val noBan = lineBanned.foldLeft(words)((acc, b) => acc && !l.contains(b))
      if (requireTerminalPunct) noBan && l.rlike("[.!?\"']$") else noBan
    }
    val pageBan = pageBanned
      .map(b => exists(linesCol, l => l.contains(b)))
      .foldLeft(lit(false))(_ || _)
    df.select(
        col(idCol).as("doc_id"),
        filter(linesCol, lineOk).as("__kept"),
        size(linesCol).as("__n"),
        pageBan.as("__ban"))
      .select(
        col("doc_id"),
        array_join(col("__kept"), "\n").as("clean_text"),
        size(col("__kept")).as("n_kept"),
        (col("__n") - size(col("__kept"))).as("n_dropped"),
        (size(col("__kept")) >= minLines && !col("__ban")).as("page_keep"))
  }
  /** Per-group rank normalization (score calibration): raw quality
    * scores are not comparable ACROSS sources (each scorer/domain has
    * its own scale), so mixing decisions use the within-group percentile
    * instead — `pct = percent_rank()` over the group, 0 for the worst
    * document of its source, 1 for the best. Ties share a rank (SQL
    * `rank` semantics), so the output is deterministic without an id
    * tiebreak and identical across engines.
    *
    * Scale shape: ONE window keyed on the group column — the same
    * exchange a per-source groupBy would pay; nothing else moves. Skewed
    * giant sources sort within their partitions (Spark spills window
    * sorts); if one source dominates the corpus, pre-split it upstream.
    */
  def rankNormalize(
      df: DataFrame,
      groupCol: String,
      scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(scoreCol))
    df.withColumn("pct",
      floor(percent_rank().over(w) * 10000 + lit(0.5)) / 10000)
  }

  /** Token-blocked phrase-blocklist filter (the C4 "bad words" gate at
    * phrase granularity): flag every document containing any of
    * `phrases` as a whitespace-delimited phrase match.
    *
    * Scale shape — never corpus × phrases: documents explode to DISTINCT
    * (doc, token) rows; the phrase table (tiny) keys by its FIRST token
    * and broadcast-joins against them, so a document only pairs with
    * phrases whose first token it contains. Survivor candidates
    * (bounded by first-token selectivity) equi-join back to the corpus
    * on the doc id for full-phrase verification — one substring check on
    * the single-spaced normalized text per candidate. Two doc-keyed
    * shuffles + one broadcast; the full text crosses an exchange only
    * for candidate docs.
    *
    * Output: one row per INPUT document — n_hits, hit phrases sorted
    * (empty when clean), keep = no hit. */
  def blocklistFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "empty blocklist")
    require(phrases.forall(_.trim.nonEmpty), "blank phrase in blocklist")
    val spark = df.sparkSession
    import spark.implicits._
    val ptab = phrases.map(_.trim.replaceAll("\\s+", " "))
      .map(p => (p.split(" ").head, p)).toDF("tok", "phrase")
    val norm = concat(lit(" "),
      regexp_replace(trim(col(textCol)), "\\s+", " "), lit(" "))
    val docs = df.select(col(idCol), norm.as("__t")).localCheckpoint(false)
    val toks = docs.select(col(idCol),
      explode(array_distinct(split(trim(col("__t")), " "))).as("tok"))
    val candidates = toks.join(broadcast(ptab), "tok")
      .select(col(idCol), col("phrase")).distinct()
    val hits = candidates.join(docs, Seq(idCol))
      .filter(col("__t").contains(concat(lit(" "), col("phrase"), lit(" "))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"),
        array_sort(collect_list(col("phrase"))).as("hit_phrases"))
    df.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("hit_phrases"),
          array().cast("array<string>")).as("hit_phrases"),
        // NOT col("n_hits").isNull as a sibling of the n_hits re-alias —
        // lateral alias capture would bind it to the coalesced sibling
        // (the round-9 trap); this form reads only the join output
        (coalesce(col("n_hits"), lit(0L)) === 0).as("keep"))
  }

  /** One full-batch gradient-descent step of a logistic-regression
    * quality classifier — the training kernel of the fastText-style
    * quality filter (the GPT-3/CCNet "looks like the reference corpus"
    * gate; Brown et al. 2020 App. A). Callers supply the feature columns
    * (scan-stage expressions over the document), a {0,1} label, the
    * incoming weight vector and a learning rate; the operator returns the
    * gradient and updated weight per feature plus the pre-step mean
    * log-loss. Iterating it to convergence IS classifier training;
    * scoring with the learned weights is a pure scan-stage projection.
    *
    * Scale shape: the entire step is ONE partial-aggregatable global sum
    * — per row compute p = σ(w·x) then (p−y)·x_j for each feature, sum
    * map-side, merge |features|+2 doubles per partition. No shuffle of
    * data rows, result is a single row exploded to feature granularity.
    * This is exactly how distributed full-batch LR runs at 100 TB: the
    * model (a handful of doubles) rides the aggregation buffer.
    *
    * Output: one row per feature — feature (0-based index), w_old, grad
    * (mean gradient), w_new, and the (identical per row) mean train_loss,
    * all 4-decimal-floored for engine-portable compare. */
  def logregStep(
      df: DataFrame,
      features: Seq[Column],
      label: Column,
      w0: Seq[Double],
      eta: Double): DataFrame = {
    require(features.nonEmpty && features.size == w0.size,
      "features and w0 must align")
    val y = label.cast("double")
    val z = features.zip(w0).map { case (x, w) => x * lit(w) }
      .reduce(_ + _)
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    val gradSums = features.zipWithIndex.map { case (x, j) =>
      sum((p - y) * x).as(s"g$j")
    }
    // clamp p away from {0,1} for the LOSS only: |z| ≳ 745 saturates the
    // sigmoid in double precision and log(0) would poison train_loss to
    // ±Inf/NaN for the whole batch. The clamp is a numeric no-op whenever
    // p is representable strictly inside (0,1) — i.e. on every non-extreme
    // row — so oracle parity is untouched; the GRADIENT stays unclamped
    // ((p−y)·x is finite at saturation and clamping it would bias updates).
    val pc = greatest(least(p, lit(1.0 - 1e-12)), lit(1e-12))
    val lossSum = sum(-(y * log(pc) + (lit(1.0) - y) * log(lit(1.0) - pc)))
      .as("lsum")
    val agg = df.agg(gradSums.head, (gradSums.tail :+ lossSum
      :+ count(lit(1)).as("n")): _*)
    val fl = (c: Column) => floor(c * 10000 + lit(0.5)) / 10000
    val rows = w0.indices.map { j =>
      struct(lit(j.toLong).as("feature"), lit(w0(j)).as("w_old"),
        (col(s"g$j") / col("n")).as("g"))
    }
    agg.select(explode(array(rows: _*)).as("r"),
        (col("lsum") / col("n")).as("ml"))
      .select(col("r.feature").as("feature"),
        col("r.w_old").as("w_old"),
        fl(col("r.g")).as("grad"),
        fl(col("r.w_old") - lit(eta) * col("r.g")).as("w_new"),
        fl(col("ml")).as("train_loss"))
  }

  /** DoReMi-style domain-mixture reweighting, one exponentiated-gradient
    * step (Xie et al. 2023, arXiv:2305.10429 §3): upweight domains whose
    * proxy-model loss EXCEEDS the reference level (they carry the most
    * learnable signal), starting from the uniform mixture —
    * `α_d ∝ exp(η · max(0, loss_d − loss_ref))`, then smooth with the
    * uniform distribution (`(1−c)·normalized + c/D`) so no domain's
    * weight collapses to zero. Callers supply the per-document loss
    * column (in production the per-doc loss of a small proxy LM; any
    * deterministic difficulty proxy works) and the reference level is
    * the corpus-wide mean of the same column.
    *
    * Scale shape: two partial-aggregatable passes over a DOMAIN-sized
    * key space — per-domain (sum, count) plus the global mean, then the
    * normalizer over the domain table (tiny, broadcast both ways). The
    * corpus itself crosses no exchange; at 100 TB this is the cheapest
    * query in the pipeline and reruns every proxy-model checkpoint.
    *
    * Output: one row per domain — n_docs, domain_loss, excess, alpha
    * (4-decimal-floored; alphas sum to ~1 up to rounding). */
  def mixtureWeights(
      df: DataFrame,
      domainCol: String,
      loss: Column,
      eta: Double,
      smooth: Double): DataFrame = {
    val fl = (c: Column) => floor(c * 10000 + lit(0.5)) / 10000
    val perDoc = df.select(col(domainCol).as("domain"), loss.as("__l"))
    val domains = perDoc.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), avg(col("__l")).as("dl"))
    val ref = perDoc.agg(avg(col("__l")).as("ref_loss"))
    val scored = domains.crossJoin(broadcast(ref))
      .withColumn("excess", greatest(lit(0.0), col("dl") - col("ref_loss")))
      .withColumn("score", exp(lit(eta) * col("excess")))
    val norm = scored.agg(sum(col("score")).as("z"),
      count(lit(1)).as("d"))
    scored.crossJoin(broadcast(norm))
      .select(col("domain"), col("n_docs"),
        fl(col("dl")).as("domain_loss"),
        fl(col("excess")).as("excess"),
        fl(lit(1.0 - smooth) * col("score") / col("z")
          + lit(smooth) / col("d")).as("alpha"))
  }
}
