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
}
