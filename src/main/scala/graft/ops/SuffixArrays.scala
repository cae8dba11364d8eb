package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed suffix-array construction by prefix doubling (Manber &
  * Myers, SIAM J. Comput. 1990) — the index structure behind
  * substring-level training-data dedup (Lee et al., ACL 2022 build a
  * corpus suffix array to find and cut repeated spans; graft's
  * `Dedup.spanDedup` is the hashed approximation, this is the exact
  * tool).
  *
  * Reference scope: pypeman has no text-index operators; this extends the
  * §2.6 training-data tier alongside `q_span_dedup` / `q_dup_ngrams`.
  *
  * Shape: ranks live per (doc, position) row; round k refines "rank by
  * first k chars" into "rank by first 2k chars" with two windows, both
  * partitioned by document — lead(rank, k) fetches the rank of the
  * suffix k positions ahead (contiguous positions make lead() exact),
  * dense_rank over (rank, next-rank) re-ranks. ceil(log2(cap)) rounds
  * total. Every window partitions by doc id, so the whole build is ONE
  * exchange keyed on doc id followed by in-partition sorts — per-doc
  * work is O(L·log²L) local CPU, parallelism is #docs, and no stage ever
  * materializes doc-length² bytes (the text column is dropped after the
  * initial character explode; only (id, pos, rank) longs flow between
  * rounds).
  *
  * A CORPUS-wide suffix array (Lee et al.'s actual form) is the same
  * loop with the windows unpartitioned — which in Spark would funnel
  * into a single partition. The scale path there is range-partitioned
  * global sorts (orderBy) with rank = partition-offset + local row
  * number; per-DOC arrays sidestep that machinery and already serve
  * within-document repetition analysis, so this module ships the
  * partitioned form only.
  */
object SuffixArrays {

  /** Suffix ranks for every position of every document: returns
    * (id, pos, sa_rank) where pos is 1-based and sa_rank is the 1-based
    * lexicographic position of suffix text[pos..] among the document's
    * suffixes (byte-order comparison; a proper prefix sorts before its
    * extensions, matching SQL string ordering). Text is truncated to
    * `cap` chars first; ranks are total (no ties — distinct suffix
    * lengths break any prefix tie by the end-of-string sentinel, which
    * ranks below every character).
    *
    * Collation caveat: cross-engine rank parity holds for ASCII text
    * (byte order == codepoint order); callers comparing against another
    * engine should pre-strip non-ASCII, as `q_suffix_array` does.
    */
  def suffixRanks(
      df: DataFrame, idCol: String, textCol: String, cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be ≥ 1, got $cap")
    val docs = df
      .select(col(idCol).as("id"), substring(col(textCol), 1, cap).as("t"))
      .filter(length(col("t")) >= 1) // split("", "") yields [""], not []
    // seed: rank by first character. posexplode gives contiguous 0-based
    // positions, which lead() below depends on.
    var cur = docs
      .select(col("id"), posexplode(split(col("t"), "")))
      .toDF("id", "pos0", "ch")
      .select(col("id"), (col("pos0") + 1).cast("long").as("pos"),
        dense_rank().over(Window.partitionBy("id").orderBy("ch"))
          .cast("long").as("r"))
    var k = 1
    while (k < cap) {
      // rank of the suffix k ahead; 0 = past-the-end sentinel, below
      // every real rank (≥ 1) so shorter suffixes sort first
      val byPos = Window.partitionBy("id").orderBy("pos")
      val paired = cur.withColumn(
        "r2", coalesce(lead(col("r"), k).over(byPos), lit(0L)))
      cur = paired.select(col("id"), col("pos"),
        dense_rank()
          .over(Window.partitionBy("id").orderBy(col("r"), col("r2")))
          .cast("long").as("r"))
      k *= 2
    }
    cur.select(col("id"), col("pos"), col("r").as("sa_rank"))
  }
}
