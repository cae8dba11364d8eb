package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
  * 2003 — the MOSS algorithm): the standard LOCAL fingerprinting scheme for
  * substring-level near-duplicate detection. Guarantee: any shared
  * substring of length ≥ w+k−1 between two documents yields at least one
  * shared fingerprint, while expected density is only 2/(w+1) of the
  * k-grams — a principled, bounded-size sketch that positional sampling
  * (every i-th gram) cannot match (it breaks under single-char inserts).
  *
  * Relational form (one shuffle):
  *   1. normalize: lower + strip non-alphanumerics (whitespace/punct
  *      insensitivity, §2 of the paper);
  *   2. explode k-gram positions, hash each gram — md5 HEX; on fixed-width
  *      lowercase hex, lexicographic order IS numeric order of the 128-bit
  *      value, so window minima need no numeric conversion and any engine
  *      with md5 reproduces the selection bit-for-bit;
  *   3. per-window minimum via a doc-partitioned window frame
  *      (`ROWS BETWEEN CURRENT AND w−1 FOLLOWING`) — the ONE exchange, on
  *      the doc key; position windows never cross documents;
  *   4. distinct (doc, fingerprint): rides the same doc-hash distribution
  *      (id ⊆ grouping keys ⇒ no second exchange).
  *
  * At 100 TB the explode multiplies rows by doc length, but only slim
  * (id, pos, 32-char hash) rows reach the exchange — the document text
  * never shuffles; skew = longest single document, which the doc-key
  * partitioning spreads no worse than any per-doc operator. */
object Winnow {

  /** Normalized text the grams are drawn over (paper §2: fingerprints must
    * survive whitespace/case/punctuation edits). */
  def normalize(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9]", "")

  /** Fingerprint set per document: (idCol, fp) rows, fp = md5 hex of a
    * selected k-gram. Documents with fewer than k+w−1 normalized chars
    * (no complete window) emit nothing — matching the guarantee's domain. */
  def fingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 16): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    val grams = docs
      .select(col(idCol), normalize(col(textCol)).as("__s"))
      .filter(length(col("__s")) >= k + w - 1)
      .select(col(idCol), col("__s"),
        (length(col("__s")) - (k - 1)).as("__n"),
        explode(sequence(lit(1), length(col("__s")) - (k - 1))).as("__p"))
      .select(col(idCol), col("__n"), col("__p"),
        md5(gramAt(col("__s"), col("__p"), k)).as("__h"))
    val frame = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__p"))
      .rowsBetween(0, w - 1)
    grams
      .withColumn("fp", min(col("__h")).over(frame))
      .filter(col("__p") <= col("__n") - (w - 1))
      .select(col(idCol), col("fp"))
      .distinct()
  }

  /** `substring(s, pos, len)` with a COLUMN position (the built-in DSL
    * overload takes literal ints only). */
  private def gramAt(s: Column, pos: Column, len: Int): Column =
    s.substr(pos, lit(len))

  /** Winnowing-based near-duplicate pairs: documents sharing at least
    * `minShared` fingerprints, via self-join on the fingerprint value —
    * the bucket key makes this an equi-join (no all-pairs); the guarantee
    * turns `minShared` into a shared-substring-length floor.
    *
    * The fingerprint relation feeds BOTH join sides; checkpointing it
    * pins the explode+window pass to one execution (self-join
    * re-derivation would double the dominant cost — measured 5.2 s → the
    * single-pass price at sf0.1). LAZY checkpoint: materializes at the
    * first action, both branches then read the pinned RDD — an eager one
    * would run the dominant job at plan-BUILD time (breaking plan-only
    * callers like graft.Explain). At corpus scale the same move is
    * writing the fingerprint table once before the join stage. */
  def nearDuplicates(
      fps0: DataFrame, idCol: String, minShared: Long): DataFrame = {
    val fps = fps0.localCheckpoint(false)
    val a = fps.select(col(idCol).as("a"), col("fp"))
    val b = fps.select(col(idCol).as("b"), col("fp"))
    a.join(b, "fp")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
