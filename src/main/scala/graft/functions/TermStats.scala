package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term statistics: TF-IDF keyterm extraction and PMI
  * collocation mining — the classic IR/statistical-NLP companions to the
  * BM25 search index (`graft.sim.Bm25`) and the bigram LM
  * (`graft.ops.Curation.bigramPerplexity`). Reference analogue: pypeman
  * pipelines escape to hand-written dict counting for this
  * (pypeman/nodes.py FuncNode bodies); here both are declarative
  * relational plans the optimizer can reorder.
  *
  * Scale shape (both): tokenize/explode is scan-stage; every aggregate is
  * partial (map-side combine) on uniform keys (word / word-pair / doc);
  * the joined-back statistics tables are vocabulary-bounded (Zipf) for
  * TF-IDF's df table, near-vocabulary² worst case for PMI's pair table —
  * both orders of magnitude below corpus size, so AQE picks broadcast
  * when they fit and a shuffle join when they don't. Document text never
  * crosses an exchange; only (doc_id, word, count) rows do.
  */
object TermStats {

  /** Top-k TF-IDF terms per document.
    *
    * `tf` = in-doc term count; `idf = ln((N+1)/(df+1))` (smoothed,
    * strictly positive for df < N); `score = tf · idf`. Ties break
    * lexicographically on the term so the per-doc ranking is a total
    * order (deterministic across engines and retries).
    *
    * Output: doc_id, term, tf, rank (1-based), score (4-dec floored).
    * The per-doc top-k is a window `row_number` over the (doc, term)
    * aggregate — k-bounded output, never a global sort of the corpus. */
  def tfidfTopTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = df.select(countDistinct(col(idCol)).as("n_docs"))
    val scored = tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("tf"),
        (col("tf") * log((col("n_docs") + 1).cast("double")
          / (col("df") + 1).cast("double"))).as("__score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("__score").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"),
        col("rank").cast("long").as("rank"),
        (floor(col("__score") * 10000 + lit(0.5)) / 10000).as("score"))
  }

  /** Pointwise mutual information over adjacent word pairs (collocation
    * mining, Church & Hanks 1990): `pmi = ln(c12·N / (c1·c2))` where c1/c2
    * are the pair table's marginals and N its total — high-PMI pairs are
    * phrases ("new york"), the signal tokenizer-vocab and stopword-list
    * builders use. `minCount` drops unreliable rare pairs (PMI's known
    * low-frequency bias).
    *
    * Output: w1, w2, c12, pmi (4-dec floored), one row per surviving
    * bigram type. */
  def pmiCollocations(
      df: DataFrame,
      textCol: String,
      minCount: Long): DataFrame = {
    val toks = df.select(
      filter(split(trim(col(textCol)), "\\s+"), w => length(w) > 0).as("__t"))
    val pairs = toks
      .select(explode(when(size(col("__t")) >= 2,
          transform(sequence(lit(0), size(col("__t")) - 2),
            i => struct(element_at(col("__t"), i + 1).as("w1"),
              element_at(col("__t"), i + 2).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("__b"))
      .select(col("__b.w1").as("w1"), col("__b.w2").as("w2"))
    val bc = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .localCheckpoint(true) // reused by both marginals and the total
    val c1 = bc.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val c2 = bc.groupBy(col("w2")).agg(sum(col("c12")).as("c2"))
    val n = bc.agg(sum(col("c12")).as("n_pairs"))
    bc.filter(col("c12") >= minCount)
      .join(c1, "w1").join(c2, "w2").crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c12"),
        (floor(log(col("c12").cast("double") * col("n_pairs")
            / (col("c1") * col("c2"))) * 10000 + lit(0.5)) / 10000).as("pmi"))
  }

  /** Interpolated Kneser–Ney bigram probabilities (Kneser & Ney, ICASSP
    * 1995; the absolute-discounting form of Chen & Goodman 1999 §2.7) —
    * the smoothing a count-based LM quality filter actually wants:
    *
    *   P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1·)
    *            + D·N₁₊(w1,·)/c(w1·) · N₁₊(·,w2)/B
    *
    * where N₁₊(w1,·) = distinct continuations of w1, N₁₊(·,w2) = distinct
    * LEFT contexts of w2 (the "how many contexts has this word completed"
    * novelty count that distinguishes KN from plain backoff), and B =
    * distinct bigram types. D is the standard 0.75 absolute discount.
    *
    * Numeric contract: every count is an exact BIGINT from
    * vocabulary-bounded aggregation; the probability is ONE fixed-order
    * double expression over those integers (identical IEEE sequence in
    * the oracle), floored at 4 decimals.
    *
    * Scale shape: tokenize/pair in the scan stage; the bigram count
    * table is checkpointed once and feeds three vocabulary-bounded
    * partial aggregates (left-context stats fused into ONE groupBy); the
    * type total is a 1-row broadcast. The corpus never shuffles — only
    * (token-pair, count) rows do. */
  def kneserNeyBigrams(
      df: DataFrame,
      textCol: String,
      minCount: Long,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount in (0,1), got $discount")
    val toks = df.select(
      filter(split(trim(col(textCol)), "\\s+"), w => length(w) > 0).as("__t"))
    val pairs = toks
      .select(explode(when(size(col("__t")) >= 2,
          transform(sequence(lit(0), size(col("__t")) - 2),
            i => struct(element_at(col("__t"), i + 1).as("w1"),
              element_at(col("__t"), i + 2).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("__b"))
      .select(col("__b.w1").as("w1"), col("__b.w2").as("w2"))
    val bc = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .localCheckpoint(true) // feeds three marginals + the final join
    val left = bc.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("t1"))
    val cont = bc.groupBy(col("w2")).agg(count(lit(1)).as("cont"))
    val btypes = bc.agg(count(lit(1)).as("btypes"))
    bc.filter(col("c12") >= minCount)
      .join(left, "w1").join(cont, "w2").crossJoin(broadcast(btypes))
      .select(col("w1"), col("w2"), col("c12"),
        (floor((greatest(col("c12").cast("double") - discount, lit(0.0))
            / col("c1")
          + lit(discount) * col("t1") / col("c1") * col("cont")
            / col("btypes"))
          * 10000 + lit(0.5)) / 10000).as("p_kn"))
  }

  /** χ² distinctive-term selection per class (the feature-selection
    * battery of Yang & Pedersen, ICML 1997): for each (class, term) over
    * DISTINCT per-doc tokens, the 2×2 contingency is
    *   a = class docs with term,   b = other docs with term,
    *   c = class docs without it,  d = other docs without it,
    * χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)), keeping only positively
    * associated terms (a·(N−n_cls) > b·n_cls, exact integer compare) with
    * df ≥ `minDf`, top `k` per class by (χ² desc, term asc).
    *
    * Numeric contract: a,b,c,d and ad−bc are exact BIGINTs (|ad−bc| ≤ N²
    * < 2⁵³ casts to double exactly); the two denominator halves are exact
    * BIGINT products cast to double BEFORE the one double multiply that
    * could overflow int64 — the oracle spells the identical association,
    * so χ² matches bit for bit before the 4-decimal floor.
    *
    * Scale: tokenize is scan-stage; (class, term) / term aggregates are
    * vocabulary-bounded; class sizes and N broadcast. The top-k window
    * partitions by class over vocabulary-bounded rows — never corpus
    * rows. */
  def chi2Terms(
      df: DataFrame,
      idCol: String,
      classCol: String,
      textCol: String,
      k: Int,
      minDf: Long): DataFrame = {
    val toks = df.select(col(classCol).as("cls"),
        explode(array_distinct(split(trim(col(textCol)), "\\s+"))).as("term"))
      .filter(length(col("term")) > 0)
    val a = toks.groupBy(col("cls"), col("term")).agg(count(lit(1)).as("a"))
      .localCheckpoint(true) // reused by dfreq and the scored join
    val dfreq = a.groupBy(col("term")).agg(sum(col("a")).as("df"))
    val clsSize = df.groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("n_cls"))
    val nDocs = df.select(count(lit(1)).as("n_docs"))
    val scored = a.join(dfreq, "term")
      .join(broadcast(clsSize), "cls")
      .crossJoin(broadcast(nDocs))
      .filter(col("df") >= minDf &&
        col("a") * (col("n_docs") - col("n_cls")) > (col("df") - col("a")) * col("n_cls"))
      .withColumn("b", col("df") - col("a"))
      .withColumn("c", col("n_cls") - col("a"))
      .withColumn("d", col("n_docs") - col("n_cls") - col("b"))
      .withColumn("diff", (col("a") * col("d") - col("b") * col("c")).cast("double"))
      .withColumn("chi2",
        col("n_docs").cast("double") * col("diff") * col("diff") /
          (((col("a") + col("b")) * (col("c") + col("d"))).cast("double") *
            ((col("a") + col("c")) * (col("b") + col("d"))).cast("double")))
    val w = Window.partitionBy(col("cls"))
      .orderBy(col("chi2").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("cls"), col("term"), col("a").as("df_class"),
        col("rank").cast("long").as("rank"),
        (floor(col("chi2") * 10000 + lit(0.5)) / 10000).as("chi2"))
  }

  /** Hashing-trick featurization (Weinberger et al. ICML 2009): each
    * token folds into one of `16` signed buckets via the repo's portable
    * md5 convention — bucket = first md5 hex char, sign = parity of the
    * second — so ANY engine reproduces the exact integer feature vector
    * (the signed sum cancels collision bias in expectation). Output: one
    * row per doc with BIGINT columns f0..f15; token-less docs drop (no
    * feature mass), mirroring the oracle's GROUP BY domain.
    *
    * Scale: md5 + bucket/sign are scan-stage; the vector is 16
    * partial-aggregatable conditional sums over ONE doc-keyed exchange —
    * the fixed-width dense layout downstream trainers want, with no
    * vocabulary table anywhere (the hashing trick's point at 100 TB). */
  def hashFeatures(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val h = md5(col("term"))
    val rows = toks.select(col("doc_id"),
      conv(substring(h, 1, 1), 16, 10).cast("long").as("b"),
      when(conv(substring(h, 2, 1), 16, 10).cast("long") % 2 === 0, 1L)
        .otherwise(-1L).as("sg"))
    val lanes = (0 until 16).map(j =>
      coalesce(sum(when(col("b") === j, col("sg"))), lit(0L)).as(s"f$j"))
    rows.groupBy(col("doc_id")).agg(lanes.head, lanes.tail: _*)
  }

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    * maximal stopword/punctuation-free token runs; each word scores
    * deg(w)/freq(w) where deg sums the lengths of every phrase the word
    * occurs in and freq counts its occurrences; a phrase scores the sum
    * of its word scores. Top-k phrases per document, ties broken on the
    * phrase text (total order across engines).
    *
    * Phrase segmentation is the gaps-and-islands idiom at two levels:
    * punctuation splits the text into fragments, stopwords split a
    * fragment into runs (phrase id = running stopword count — one
    * per-(doc, fragment) ordered window, keyed so it shards). Word
    * stats are a vocabulary-bounded
    * aggregate; the join back is broadcast-or-shuffle by AQE. No global
    * window, no driver state — the corpus-sized relations only ever
    * shuffle (doc_id, token) rows.
    *
    * Output: doc_id, phrase, score (4-dec floored), rank (1-based). */
  def rakeKeywords(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      stopwords: Seq[String] = TextFunctions.defaultStopwords): DataFrame = {
    // two boundary classes, handled at two levels: punctuation splits the
    // text into fragments (fi); inside a fragment, stopwords split runs
    // (pid = running stopword count) — a phrase is one (doc, fi, pid)
    val frags = df.select(col(idCol).as("doc_id"),
      posexplode(split(lower(trim(col(textCol))), "[^a-z0-9\\s]+"))
        .as(Seq("fi", "frag")))
    val toks = frags.select(col("doc_id"), col("fi"),
        posexplode(split(col("frag"), "\\s+")).as(Seq("i", "tok")))
      .filter(length(col("tok")) > 0)
      .withColumn("is_stop", col("tok").isInCollection(stopwords))
    val run = Window.partitionBy(col("doc_id"), col("fi")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val words = toks
      .withColumn("pid", sum(col("is_stop").cast("int")).over(run))
      .filter(!col("is_stop"))
    val withLen = words.withColumn("plen",
      count(lit(1)).over(
        Window.partitionBy(col("doc_id"), col("fi"), col("pid"))))
    val wstats = withLen.groupBy(col("tok"))
      .agg((sum(col("plen")).cast("double") / count(lit(1))).as("wscore"))
    val phrases = withLen.join(wstats, "tok")
      .groupBy(col("doc_id"), col("fi"), col("pid"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("i"), col("tok")))),
          s => s.getField("tok"))).as("phrase"),
        sum(col("wscore")).as("score"))
      // identical phrases in one doc carry the same score — collapse
      // them before ranking so repeats don't crowd the top-k
      .groupBy(col("doc_id"), col("phrase"))
      .agg(max(col("score")).as("score"))
    val rk = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("phrase"))
    phrases.withColumn("rank", row_number().over(rk).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("phrase"),
        (floor(col("score") * 10000 + 0.5) / 10000).as("score"), col("rank"))
  }
}
