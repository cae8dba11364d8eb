package graft.functions

import graft.plans.TextNative
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full BPE tokenizer training (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the iterative
  * merge-learning loop on top of the single-round pair statistics
  * (`TextFunctions.bpePairStats`, SURVEY §2.6 #95).
  *
  * Spark-first shape: the state that iterates is the DISTINCT-word table
  * with frequencies — vocabulary-bounded (Zipf), independent of corpus
  * size — exactly the small-state driver-loop pattern of k-means and
  * connected components. The corpus is scanned ONCE to build it; each
  * merge round then (a) aggregates weighted adjacent-pair counts over the
  * word table (partial agg, tiny shuffle), (b) fetches the single best
  * pair to the driver (a scalar parameter, the allowed collect shape),
  * (c) rewrites segmentations with the native [[graft.plans.MergePair]]
  * expression and localCheckpoints to truncate lineage. At 100 TB the
  * loop cost is `nMerges × O(vocab)` — the corpus never participates
  * after round zero.
  *
  * Determinism: ties on pair count break lexicographically on (left,
  * right), so the learned merge sequence is a pure function of the
  * corpus. Words carry a terminal `</w>` marker (reference BPE form), so
  * end-of-word units merge distinctly from word-internal ones.
  */
object Bpe {

  final case class Merge(step: Int, left: String, right: String, freq: Long)

  /** Learn `nMerges` merges. Returns the ordered merge table and the
    * final word table (word, freq, pieces). */
  def train(df: DataFrame, textCol: String, nMerges: Int): (Seq[Merge], DataFrame) = {
    var words = df
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("pieces",
        concat(filter(split(col("w"), ""), p => length(p) > 0), array(lit("</w>"))))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      val best = words
        .select(col("freq"), explode(when(size(col("pieces")) >= 2,
            transform(sequence(lit(0), size(col("pieces")) - 2),
              i => struct(element_at(col("pieces"), i + 1).as("a"),
                element_at(col("pieces"), i + 2).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect() // 1 row: the merge decision — scalar driver parameter
      if (best.isEmpty) done = true
      else {
        val row = best(0)
        val (a, b, cnt) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += Merge(step, a, b, cnt)
        words = words
          .withColumn("pieces", TextNative.mergePair(col("pieces"), a, b))
        // Checkpoint every 4th round: each un-checkpointed round only adds
        // one cheap vocab-bounded projection to the lineage, so eager
        // materialization per round costs more than the bounded recompute.
        if (step % 4 == 0) words = words.localCheckpoint(true)
        step += 1
      }
    }
    (merges.toSeq, words)
  }

  /** Apply a learned merge sequence to text: char-split each word (with
    * the `</w>` marker) and replay the merges in training order — the
    * standard BPE apply rule. The whole chain is one scan-stage column
    * expression (nMerges nested MergePair nodes, constant per-row work);
    * for large merge tables prefer segmenting with a vocab trie
    * ([[graft.plans.GreedyPieces]]) built from the trained vocabulary. */
  def applyMerges(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val word = col("__w")
    val init = concat(filter(split(word, ""), p => length(p) > 0),
      array(lit("</w>")))
    val pieces = merges.foldLeft(init)((acc, m) =>
      TextNative.mergePair(acc, m.left, m.right))
    df.select(col(idCol).as("doc_id"),
        explode(split(trim(col(textCol)), "\\s+")).as("__w"))
      .filter(length(col("__w")) > 0)
      .select(col("doc_id"), col("__w").as("word"), pieces.as("pieces"))
  }
}
