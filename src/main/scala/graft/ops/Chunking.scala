package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the context-window prep step of a
  * training/RAG pipeline: split each document into overlapping windows of
  * `window` whitespace tokens advancing by `stride`.
  *
  * Chunk starts are `0, stride, 2·stride, …, ceil((n-window)/stride)·stride`
  * so every token is covered and only the final chunk may be short; a doc
  * with `n <= window` tokens yields exactly one chunk.
  *
  * Scale shape: pure per-row array math (split → sequence → explode →
  * slice) fused into the scan stage — the explode multiplies rows but
  * introduces no shuffle and no state, so 10^11 docs chunk at full scan
  * parallelism. Chunk ids are deterministic (doc id × window index):
  * retry-stable and reproducible across runs.
  */
object Chunking {

  def slidingChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = split(trim(col(textCol)), "\\s+")
    val n = size(toks)
    // last chunk start = ceil((n - window)/stride) * stride  (0 when n <= window)
    val lastStart =
      when(n <= window, lit(0))
        .otherwise(floor((n - window + stride - 1) / lit(stride)).cast("int") * stride)
    df.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), toks.as("__toks"), lastStart.as("__last"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), col("__last"), lit(stride))).as("__start"))
      .select(
        col(idCol),
        (col("__start") / stride).cast("long").as("chunk_id"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(window)), " ").as("chunk_text"),
        size(slice(col("__toks"), col("__start") + 1, lit(window))).cast("long").as("n_chunk_tokens"))
  }

  /** Content-defined chunking (Rabin-style; the storage-dedup boundary
    * rule behind rsync/LBFS/FastCDC): a chunk ends after character
    * p+k−1 wherever the k-gram starting at p hashes to
    * `0 mod (mask+1)` — boundaries move WITH the content, so an
    * insertion re-chunks only its neighborhood while a fixed-width
    * splitter shifts every later chunk (the property that makes
    * chunk-hash dedup survive edits). Basic form: no FastCDC min/max
    * normalization (those suppressions are sequential state), gram
    * hash = the portable md5₆₀ lane so any engine reproduces every
    * boundary. Docs shorter than k chars are outside the domain
    * (mirrors Winnow) and are filtered.
    *
    * Output: (idCol, chunk_no 1-based, chunk_len, chunk_md5, truncated).
    *
    * Scale shape: boundary detection, cut assembly and chunk slicing
    * are STAGED per-row array math in the scan stage (no window, no
    * shuffle; the explode multiplies rows only at the end) — a 100 TB
    * corpus chunks at full scan parallelism, and downstream dedup is
    * one groupBy on chunk_md5.
    *
    * Skew bound: only the first `maxChars` characters chunk. The
    * boundary scan holds an O(doc-length) transient gram-hash pass per
    * row, so an uncapped 100 MB outlier would own gigabytes of one
    * task's memory; the cap pins the per-task peak to O(maxChars) by
    * construction. Truncation is loud: affected rows carry
    * `truncated = true`. */
  def cdcChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      mask: Int = 63,
      maxChars: Int = 1 << 20): DataFrame = {
    require(k >= 1 && mask >= 1, s"need k,mask >= 1, got k=$k mask=$mask")
    require(maxChars >= k, s"maxChars=$maxChars below one gram (k=$k)")
    // cut positions: 0, every content boundary, end-of-doc — ONE native
    // pass ([[graft.plans.CdcCuts]], round 19): same grams, same md5
    // 60-bit-prefix mod rule, same cut placement as the previous
    // conv(substring(md5(substr(…)))) column formula, but one reused
    // digest and no per-position substring/hex/parse allocations
    // (measured 3.2 s → see OPTIMIZATION_r19.md; ChunkingSpec pins
    // native ≡ formula on mixed ASCII/non-ASCII fixtures)
    val cuts = graft.plans.TextNative.cdcCuts(col("__s"), k, mask, maxChars)
    // array(…)/flatten let-binding (the Winnow trick): the cut array —
    // whose computation is the O(n)·md5 boundary scan — becomes a lambda
    // variable evaluated ONCE per row; naming it via withColumn instead
    // lets CollapseProject inline the scan into all three element_at
    // references per chunk (measured 57 s vs 3.9 s at sf0.1)
    val chunks = flatten(transform(array(cuts), cs =>
      transform(sequence(lit(2), size(cs)),
        i => col("__s").substr(
          element_at(cs, i - 1) + 1,
          element_at(cs, i) - element_at(cs, i - 1)))))
    df
      .select(col(idCol), col(textCol).as("__s"))
      .withColumn("__n", least(length(col("__s")), lit(maxChars)))
      .filter(col("__n") >= k)
      .select(col(idCol), posexplode(chunks).as(Seq("__i", "__c")),
        (length(col("__s")) > maxChars).as("truncated"))
      .select(col(idCol), (col("__i") + 1).cast("long").as("chunk_no"),
        length(col("__c")).cast("long").as("chunk_len"),
        md5(col("__c")).as("chunk_md5"), col("truncated"))
  }
}
