package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Okapi BM25 keyword search as a relational pipeline.
  *
  * Part of the corpus-analytics surface alongside [[Ann]]: where Ann ranks
  * by embedding distance, this ranks by lexical relevance — the standard
  * first-stage retriever for training-data curation (topic mining, targeted
  * decontamination, eval-set construction).
  *
  * Scale shape (100 TB): the query-term `isin` filter sits directly on the
  * exploded scan — BELOW the first shuffle — so only postings of the
  * queried terms (a vanishing fraction of the corpus) ever shuffle. Corpus
  * constants (N, avgdl) are one tiny aggregate crossJoin-broadcast back;
  * per-term document frequencies are a second small aggregate broadcast
  * into the scoring join. The source is scanned twice (once for constants,
  * once for postings) — both scans are column-pruned to (id, text); for
  * repeated queries materialize [[postings]] once and serve from it.
  */
object Bm25 {

  /** Lowercased whitespace tokens; empty strings dropped (blank docs → []). */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** The inverted-index postings relation `(id, dl, term, tf)`. Write this
    * out bucketed by `term` to serve repeated queries without re-tokenizing
    * the corpus. One shuffle, keyed on (id, term) — uniform by construction. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
      .select(col("id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Per-document BM25 scores for `query` (docs with no query term are
    * absent). Columns: id, score (double), n_terms (matched query terms). */
  def scores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      query: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val base = docs
      .select(col(idCol).as("id"), tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
      .select(col("id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(query: _*)) // scan-stage pruning: only query-term postings shuffle
      .groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // dl for the corpus constants = number of \S+ runs — identical to
    // size(tokens(text)) for every string, but regexp_count counts in
    // place where the tokens() form allocates the split array plus a
    // second filtered copy per document just to take its length. This
    // scan touches EVERY document (no term pruning applies), so the
    // allocation-free count is the cheaper full pass at corpus scale.
    val stats = docs.select(
        regexp_count(col(textCol), lit("\\S+")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val dfreq = base.groupBy(col("term")).agg(count(lit(1)).as("df"))
    base
      .join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("w",
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("id"))
      .agg(sum(col("w")).as("score"), count(lit(1)).as("n_terms"))
  }

  /** Top-k docs for `query` by BM25, deterministic id tiebreak. */
  def search(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      query: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    scores(docs, idCol, textCol, query, k1, b)
      .orderBy(col("score").desc, col("id"))
      .limit(k)
}
