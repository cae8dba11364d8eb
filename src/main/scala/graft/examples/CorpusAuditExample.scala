package graft.examples

import graft.ops.{Cdc, Winnow}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-refresh audit — the round-8 operators composed the way a weekly
  * crawl refresh would run them: given LAST week's corpus and THIS week's,
  * answer "what actually changed, and did the new material smuggle in
  * near-duplicates of what we already have?"
  *
  *   1. FINGERPRINT both versions with winnowing (substring-robust,
  *      whitespace/punctuation-insensitive — a reformatted page is NOT a
  *      change) and reduce each doc to one content signature: the xor-fold
  *      of its fingerprint hashes (order-independent, partial-aggregatable
  *      — one agg over the fingerprint rows, no sort, no collect);
  *   2. SNAPSHOT-DIFF the (doc_id → signature) tables: added / removed /
  *      changed, unchanged dropped — one key-partitioned full outer join;
  *   3. SCREEN the added docs against the RETAINED corpus with the
  *      fingerprint-value equi-join: incoming near-duplicates of existing
  *      material, flagged before they enter the training mix.
  *
  * Every stage is declarative: two winnow passes (one exchange each), one
  * diff join, one dedup join — bounded shuffles at any corpus size.
  */
object CorpusAuditExample {

  final case class Report(
      nAdded: Long,
      nRemoved: Long,
      nChanged: Long,
      incomingNearDups: Long)

  /** One order-independent content signature per doc from its winnowing
    * fingerprints: xor of the 64-bit hash prefixes. Changing ANY selected
    * gram flips the signature; formatting-only edits select the same grams
    * and keep it.
    *
    * Docs below the winnowing floor (fewer than k+w−1 normalized chars
    * emit no fingerprints) fall back to a hash of the normalized text —
    * still formatting-insensitive, and it keeps short docs visible to the
    * snapshot diff instead of silently excluded. */
  def signatures(docs: DataFrame, k: Int = 8, w: Int = 16): DataFrame = {
    val winnowed = Winnow.fingerprints(docs, "doc_id", "text", k, w)
      .select(col("doc_id"),
        conv(substring(col("fp"), 1, 15), 16, 10).cast("long").as("h"))
      .groupBy(col("doc_id"))
      .agg(expr("aggregate(collect_list(h), 0L, (a, x) -> a ^ x)").as("sig"))
    docs
      .select(col("doc_id"),
        conv(substring(md5(Winnow.normalize(col("text"))), 1, 15), 16, 10)
          .cast("long").as("__short_sig"))
      .join(winnowed, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("sig"), col("__short_sig")).as("sig"))
  }

  def run(spark: SparkSession, oldDocs: DataFrame, newDocs: DataFrame): Report = {
    val diff = Cdc.snapshotDiff(
      signatures(oldDocs), signatures(newDocs),
      keyCols = Seq("doc_id"), compareCols = Seq("sig"))
      .localCheckpoint(true) // three class counts + the added-id join below
    def n(cls: String): Long = diff.filter(col("change") === cls).count()

    // incoming near-dup screen: fingerprints of ADDED docs vs the corpus
    // that survives the refresh (present in new, not added themselves)
    val addedIds = diff.filter(col("change") === "added").select(col("doc_id"))
    val newFps = Winnow.fingerprints(newDocs, "doc_id", "text")
      .localCheckpoint(true) // feeds both sides of the screen below
    val addedFps = newFps.join(broadcast(addedIds), "doc_id")
    val retainedFps = newFps.join(broadcast(addedIds), Seq("doc_id"), "left_anti")
    val dups = addedFps.select(col("doc_id").as("a"), col("fp"))
      .join(retainedFps.select(col("doc_id").as("b"), col("fp")), "fp")
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 3)
      .select(col("a")).distinct()

    Report(n("added"), n("removed"), n("changed"), dups.count())
  }
}
