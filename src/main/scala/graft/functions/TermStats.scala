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
}
