package graft

import graft.examples.CorpusAuditExample

/** Corpus-refresh audit example: the change classes land where they
  * should, reformatting is NOT a change, and an incoming near-copy of
  * retained material is flagged. */
class CorpusAuditExampleSpec extends SparkSpec {
  import spark.implicits._

  private val keep = "The quick brown fox jumps over the lazy dog while the cat watches quietly from the windowsill."
  private val reform = "the QUICK brown fox,   jumps over the lazy dog — while the cat watches quietly from the windowsill!!"
  private val oldBody = "Entirely original second document about distributed query engines and shuffle boundaries."
  private val newBody = "Entirely rewritten second document about stream processing and watermark semantics instead."
  private val dropped = "This document exists only in last week's corpus and disappears after the refresh."
  private val novel = "A genuinely new page with content unlike anything else in the corpus this week or before."
  private val nearCopy = "PREFIX The quick brown fox jumps over the lazy dog while the cat watches quietly from the windowsill. SUFFIX"

  test("refresh audit: classes, reformat-invariance, incoming near-dup flag") {
    val oldDocs = Seq(
      (1L, keep), (2L, keep), (3L, oldBody), (4L, dropped)
    ).toDF("doc_id", "text")
    val newDocs = Seq(
      (1L, keep),      // untouched → unchanged, dropped from the diff
      (2L, reform),    // formatting-only edit → same signature → unchanged
      (3L, newBody),   // real rewrite → changed
      (5L, novel),     // added, novel
      (6L, nearCopy)   // added, near-copy of retained doc 1 → flagged
    ).toDF("doc_id", "text")
    val r = CorpusAuditExample.run(spark, oldDocs, newDocs)
    assert(r.nAdded == 2, s"added: $r")
    assert(r.nRemoved == 1, s"removed: $r")
    assert(r.nChanged == 1, s"changed: $r")
    assert(r.incomingNearDups == 1, s"near-dups: $r")
  }

  test("signatures: formatting-only edits keep the signature, rewrites flip it") {
    val sigs = CorpusAuditExample.signatures(
      Seq((1L, keep), (2L, reform), (3L, newBody)).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }
}
