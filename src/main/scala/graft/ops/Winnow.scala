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
  * Relational form (ZERO shuffle — the windows never cross documents, so
  * the whole selection is per-row column math in the scan stage):
  *   1. normalize: lower + strip non-alphanumerics (whitespace/punct
  *      insensitivity, §2 of the paper);
  *   2. hash every k-gram into ONE per-document array — md5 HEX; on
  *      fixed-width lowercase hex, lexicographic order IS numeric order of
  *      the 128-bit value, so window minima need no numeric conversion and
  *      any engine with md5 reproduces the selection bit-for-bit. The O(n)
  *      hash pass is bound as a lambda variable via a single-element
  *      `transform(array(…), hs -> …)` so CollapseProject cannot inline
  *      (= duplicate) it into each of the n window-minimum consumers;
  *   3. sliding minima `array_min(slice(hs, p, w))` per start position —
  *      still inside the same projection, no exchange, no sort;
  *   4. `array_distinct` per document, then explode to (id, fp) rows.
  *      Ids are one-row-per-document, so per-doc dedup IS the global
  *      distinct, again without an exchange.
  *
  * An earlier revision exploded the gram positions and took the minima
  * with a doc-partitioned window — semantically identical, but it paid a
  * full exchange + sort of every (id, pos, hash) row for an ordering the
  * generator had already produced; at sf0.1 the rewrite cut the focused
  * median ~3×. At 100 TB the array form keeps each document's O(n·48 B)
  * hash array inside its partition — peak memory is the longest single
  * document (a 1 MB doc ⇒ ~48 MB transient array), the same skew unit as
  * any per-doc operator, and nothing reaches a shuffle. */
object Winnow {

  /** Normalized text the grams are drawn over (paper §2: fingerprints must
    * survive whitespace/case/punctuation edits). */
  def normalize(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9]", "")

  /** Fingerprint set per document: (idCol, fp, truncated) rows, fp = md5
    * hex of a selected k-gram. Documents with fewer than k+w−1 normalized
    * chars (no complete window) emit nothing — matching the guarantee's
    * domain.
    *
    * Skew bound: grams are drawn only from the first `maxChars`
    * normalized characters. The per-row transient state is the k-gram
    * hash array (~48 B/char), so an UNCAPPED 100 MB outlier document
    * would allocate ~5 GB inside one task — the cap makes the per-task
    * peak `maxChars · 48 B` (48 MB at the 2²⁰ default) by construction,
    * independent of the worst document in the corpus. Truncation is
    * loud, not silent: affected rows carry `truncated = true`. */
  def fingerprints(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 16, maxChars: Int = 1 << 20): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    require(maxChars >= k + w - 1,
      s"maxChars=$maxChars below one window (k+w-1=${k + w - 1})")
    // fused native selection (round 17): gram md5 → sliding window min →
    // distinct in ONE JVM pass with a flat digest buffer and a monotonic
    // deque ([[graft.plans.WinnowFingerprints]] — identical fp set to the
    // composed transform/slice/array_min/array_distinct form, which
    // allocated O(n) hex strings + window slices per document and read
    // GC-bound at 3× linear in the r17 sf10 stage probe)
    Spread.toSessionParallelism(docs, idCol)
      .select(col(idCol), normalize(col(textCol)).as("__s"))
      .filter(length(col("__s")) >= k + w - 1)
      .select(col(idCol),
        explode(graft.plans.TextNative.winnowFps(
          col("__s"), k, w, maxChars)).as("fp"),
        (length(col("__s")) > maxChars).as("truncated"))
  }

  /** Sentinel for `nearDuplicates.maxDocFreq`: derive the stop-gram cap
    * from the corpus ([[autoDocFreqCap]]). This is the DEFAULT since
    * round 16 — before that, 0 meant uncapped. Callers that relied on
    * the old uncapped default must now pass [[Uncapped]] explicitly. */
  val AutoCap: Long = 0L

  /** Sentinel for `nearDuplicates.maxDocFreq`: no stop-gram cap — exact
    * pair enumeration, quadratic in the hottest fingerprint bucket.
    * Test/audit use only; never the production form at corpus scale. */
  val Uncapped: Long = -1L

  /** Winnowing-based near-duplicate pairs: documents sharing at least
    * `minShared` fingerprints, via self-join on the fingerprint value —
    * the bucket key makes this an equi-join (no all-pairs); the guarantee
    * turns `minShared` into a shared-substring-length floor.
    *
    * The fingerprint relation feeds BOTH join sides; checkpointing it
    * pins the O(corpus) md5 scan to one execution (self-join
    * re-derivation would double the dominant cost). LAZY checkpoint:
    * materializes at the
    * first action, both branches then read the pinned RDD — an eager one
    * would run the dominant job at plan-BUILD time (breaking plan-only
    * callers like graft.Explain). At corpus scale the same move is
    * writing the fingerprint table once before the join stage.
    *
    * '''Breaking change (round 16):''' the `maxDocFreq` default `0`
    * ([[AutoCap]]) now means ''auto-derived stop-gram cap'', not
    * ''uncapped'' — default output shrinks by template-bucket pairs.
    * Pass [[Uncapped]] (`-1`) for the pre-round-16 exact behavior. */
  def nearDuplicates(
      fps0: DataFrame, idCol: String, minShared: Long,
      maxDocFreq: Long = AutoCap): DataFrame = {
    val all = fps0.localCheckpoint(false)
    // Boilerplate cap (round-12, from the sf1 slope audit): a fingerprint
    // shared by hundreds of documents is TEMPLATE text, not near-dup
    // signal, and it makes pair enumeration quadratic in the hottest
    // bucket — the sf1 measurement read a 3.8k-doc bucket emitting 7M
    // pairs inside one join task (38x wall at 10x data). Dropping
    // fingerprints with doc-frequency > maxDocFreq is the standard
    // stop-gram convention of corpus dedup pipelines; genuine near-dup
    // pairs still co-share their rarer fingerprints. The df relation is
    // fp-keyed like the self-join itself, so the filter rides the same
    // exchange. 0 = AUTO ([[autoDocFreqCap]], the IVF nlist = 0
    // precedent); negative disables (exact pair enumeration, quadratic
    // in the hottest bucket — test/audit use only).
    // AUTO path: the census job yields BOTH the stop-gram cap and the
    // pair-join partition count below — one driver round-trip buys two
    // corpus-derived sizes
    val census: Option[(Long, Long)] =
      if (maxDocFreq == 0L) Some(fpCensus(all)) else None
    val cap = census.map { case (t, d) => capFromCensus(t, d) }
      .getOrElse(maxDocFreq)
    val fps =
      if (cap <= 0) all
      else {
        val kept = all.groupBy(col("fp"))
          .agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap)
          .select(col("fp"))
        all.join(kept, "fp")
      }
    // Pair-join partition sizing (round 18): at sf10 the capped pair join
    // spills at the session's default 32 post-shuffle partitions — the
    // r17 ScaleProbe sweep read parts=32 121.8 s / parts=128 60.7 s /
    // parts=256 85.3 s on 13.3 M fingerprint rows — so the join-side
    // partitioning is sized from the fingerprint-row total:
    // one partition per ~100k fingerprint rows (13.3 M → 132, the
    // measured sweet spot), never below the session default (small
    // corpora keep their plan byte-identical — no repartition inserted),
    // capped at 1024. Query-local by design: the global
    // initialPartitionNum=256 experiment is REJECTED (r16 — it re-sized
    // every exchange and regressed the sf0.1 short tier); this resizes
    // only the one join the sweep measured spilling. Both join branches
    // project from the SAME repartitioned relation, so the exchange is
    // reused and the fp-keyed join inserts no further shuffle.
    //
    // The total comes from the AUTO census when one ran; EXPLICIT-cap
    // callers (round 19 — the q_winnow_pairs fixed-cap form read 39.7 s
    // vs the sized AUTO form's 35.0 s on the same sf10 chunk) pay one
    // count on the already-checkpointed relation instead, the same
    // driver-scalar cost class as the census. Either way the total is
    // PRE-cap while the join runs over the capped relation — an upper
    // bound by design: recounting after capping would pay a second pass
    // over the relation, over-partitioning is perf-benign (AQE coalesces
    // near-empty post-shuffle partitions), and on template-heavy corpora
    // the cap removes ROWS but the surviving near-dup buckets still
    // carry most of the join's pair volume. Uncapped (-1) is the
    // test/audit tier and keeps the session default untouched.
    val defaultParts =
      fps0.sparkSession.sessionState.conf.numShufflePartitions
    val totalForSizing: Option[Long] = census.map(_._1).orElse(
      if (maxDocFreq > 0L) Some(all.count()) else None)
    val parts = totalForSizing.map { total =>
      math.min(1024L, math.max(defaultParts.toLong, total / 100000L)).toInt
    }.getOrElse(defaultParts)
    val sized = if (parts > defaultParts) fps.repartition(parts, col("fp"))
                else fps
    val a = sized.select(col(idCol).as("a"), col("fp"))
    val b = sized.select(col(idCol).as("b"), col("fp"))
    a.join(b, "fp")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** AUTO stop-gram cap — `maxDocFreq = 0`'s derivation (the IVF
    * `nlist = 0` precedent, sim/Ann.scala): cap = max(16, ⌈4 × mean
    * fingerprint doc-frequency⌉), in EXACT integer arithmetic so any
    * oracle engine reproduces the same cap from the same relation
    * (`(4·total + distinct − 1) div distinct` — no float division at the
    * ceil boundary).
    *
    * Why the MEAN is the right normalizer at 100 TB: a fingerprint's
    * doc-frequency measures its cluster — genuine near-dup clusters sit
    * near the corpus mean df (mean = total fp rows / distinct fps, which
    * is corpus-size-STABLE once content diversity grows with the corpus;
    * measured 11.25 at sf0.1 vs 11.30 at sf1 on the decade corpus), while
    * TEMPLATE text grows its bucket ∝ corpus (measured: max df 316 →
    * 3,834 over the same decade, ~700 M pairs from the hottest bucket
    * alone at the next). Cutting at a fixed MULTIPLE of the mean therefore
    * converges to a corpus-independent cap: the pair census stays
    * Σ C(df,2) ≤ (cap/2)·Σdf ∝ total fingerprint rows (linear), and the
    * per-task skew unit is C(cap,2) pairs regardless of how hot the worst
    * template bucket gets. The 16 floor protects tiny corpora where mean
    * df ≈ 1–3 and a 4× cut would drop genuine small clusters. One
    * driver-side 2-long scalar per call (count + count-distinct on the
    * already-checkpointed fps), the same cost class as nlist = 0's
    * corpus count. */
  def autoDocFreqCap(fps: DataFrame): Long = {
    val (total, distinct) = fpCensus(fps)
    capFromCensus(total, distinct)
  }

  /** One census job over a fingerprint relation: (total rows, distinct
    * fps) — the two scalars every AUTO sizing law here derives from. */
  private def fpCensus(fps: DataFrame): (Long, Long) = {
    val r = fps.agg(count(lit(1)).as("t"),
      countDistinct(col("fp")).as("d")).head()
    (r.getLong(0), math.max(r.getLong(1), 1L))
  }

  private def capFromCensus(total: Long, distinct: Long): Long =
    math.max(16L, (4L * total + distinct - 1L) / distinct)
}
