package graft

import graft.ops.Winnow
import org.apache.spark.sql.functions._

/** Winnowing fingerprints vs an independent in-memory reference
  * implementation, plus the paper's coverage guarantee (Schleimer et al.
  * 2003, §3: any shared substring of length ≥ w+k−1 yields at least one
  * shared fingerprint). */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Naive reference: normalize, hash every k-gram, take each window's
    * minimum, dedupe. */
  private def naive(text: String, k: Int, w: Int): Set[String] = {
    val s = text.toLowerCase.replaceAll("[^a-z0-9]", "")
    if (s.length < k + w - 1) Set.empty
    else {
      val grams = (0 to s.length - k).map(i => md5hex(s.substring(i, i + k)))
      (0 to grams.length - w).map(p => grams.slice(p, p + w).min).toSet
    }
  }

  private val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog, again and again!"),
    (2L, "A totally different document with its own content and phrasing."),
    (3L, "short"), // below k+w-1 normalized chars: no complete window
    (4L, "Prefix text THEN the quick brown fox jumps over the lazy dog suffix trail.")
  ).toDF("doc_id", "text")

  test("fingerprints match the naive reference implementation per doc") {
    val got = Winnow.fingerprints(docs, "doc_id", "text", k = 5, w = 4)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    val want = Seq(
      1L -> "The quick brown fox jumps over the lazy dog, again and again!",
      2L -> "A totally different document with its own content and phrasing.",
      4L -> "Prefix text THEN the quick brown fox jumps over the lazy dog suffix trail.")
      .map { case (id, t) => id -> naive(t, 5, 4) }.toMap
    assert(got == want)
    assert(!got.contains(3L))
  }

  test("guarantee: docs sharing a >= w+k-1 substring share a fingerprint") {
    val fps = Winnow.fingerprints(docs, "doc_id", "text", k = 5, w = 4)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    // docs 1 and 4 share "the quick brown fox jumps over the lazy dog"
    // (normalized run of 36 >= 4+5-1 chars)
    assert((fps(1L) & fps(4L)).nonEmpty)
    // unrelated docs share nothing at this scale
    assert((fps(1L) & fps(2L)).isEmpty)
  }

  test("maxChars skew cap: 10 MB document stays bounded, truncation is loud") {
    // per-task transient state is O(maxChars), not O(doc): the gram
    // sequence is bounded BEFORE hashing, so this completes with a small
    // cap where the uncapped form would stage ~10M md5 strings
    val big = {
      val sb = new StringBuilder(10 * 1024 * 1024)
      var i = 0
      while (i < 10 * 1024 * 1024) { sb.append(('a' + (i * 7919 % 26)).toChar); i += 1 }
      sb.toString
    }
    val cap = 5000
    val df = Seq((1L, big)).toDF("doc_id", "text")
    val rows = Winnow.fingerprints(df, "doc_id", "text", k = 5, w = 4,
      maxChars = cap).collect()
    assert(rows.nonEmpty && rows.forall(_.getBoolean(2)),
      "capped rows must carry truncated = true")
    // semantics: capped run ≡ uncapped run over the first cap chars
    val pre = Seq((1L, big.substring(0, cap))).toDF("doc_id", "text")
    val wantRows = Winnow.fingerprints(pre, "doc_id", "text", k = 5, w = 4)
      .collect()
    assert(wantRows.forall(!_.getBoolean(2)), "under-cap rows unflagged")
    assert(rows.map(_.getString(1)).toSet == wantRows.map(_.getString(1)).toSet)
  }

  test("nearDuplicates: fingerprint equi-join surfaces the overlapping pair, a<b") {
    val fps = Winnow.fingerprints(docs, "doc_id", "text", k = 5, w = 4)
    // -1 = exact uncapped enumeration (0 is the AUTO stop-gram cap)
    val pairs = Winnow.nearDuplicates(fps, "doc_id", minShared = 1L,
        maxDocFreq = -1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 4L)))
    assert(pairs.head._3 >= 1L)
  }

  test("autoDocFreqCap: max(16, ceil(4·mean df)) in exact integer arithmetic; 0 routes through it") {
    // 7 rows over 3 distinct fps → mean df = 7/3; 4·mean = 28/3 → ⌈·⌉ = 10
    // → floor lifts to 16
    val fps = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "x"),
      (1L, "y"), (2L, "y"), (1L, "z")).toDF("id", "fp")
    assert(Winnow.autoDocFreqCap(fps) == 16L)
    // above the floor: 300 rows / 6 distinct → mean 50, cap = 200
    val hot = (1 to 300).map(i => (i.toLong, s"f${i % 6}")).toDF("id", "fp")
    assert(Winnow.autoDocFreqCap(hot) == 200L)
    // ceil boundary is integer-exact: 7 rows / 4 distinct → (28+3)/4 = 7
    // integer-div → 7 → floor lifts to 16; and 130/2 → 4·65 = 260
    val even = (1 to 130).map(i => (i.toLong, s"g${i % 2}")).toDF("id", "fp")
    assert(Winnow.autoDocFreqCap(even) == 260L)
    // maxDocFreq = 0 routes through the auto cap: on this corpus every fp
    // has df ≤ 16, so auto-capped pairs = exact pairs
    val docFps = Winnow.fingerprints(docs, "doc_id", "text", k = 5, w = 4)
    val auto = Winnow.nearDuplicates(docFps, "doc_id", minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(auto == Seq((1L, 4L)))
  }
}
