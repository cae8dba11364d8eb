package graft.ops

import org.apache.spark.sql.DataFrame
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
}
