package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the text-hashing hot path (shingling, MinHash,
  * SimHash).
  *
  * The composable formulations (`transform`/`aggregate` lambdas) evaluate
  * interpretively per array element; MinHash referenced the shingle array
  * k times and SimHash folded the hash array 64 times. These expressions do
  * the whole computation in one pass per row in a tight JVM loop.
  * `CodegenFallback` costs one virtual call per row — noise next to the
  * per-element interpretation it replaces. Signature values are unchanged
  * for shingles (same strings); MinHash/SimHash hash definitions are
  * engine-internal (rows-only queries; specs assert semantic properties).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val sb = new java.lang.StringBuilder
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature: k xxhash64 permutations (seed = 0..k-1) minimized in
  * a single pass over the shingle array. */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val nEl = arr.numElements()
    while (i < nEl) {
      val s = arr.getUTF8String(i)
      var j = 0
      while (j < k) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, j)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box): Array[Any])
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** SimHash: 64-bit bit-vote fingerprint over distinct whitespace tokens,
  * tokenization + hashing + voting fused into one pass. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        val u = UTF8String.fromString(toks(i))
        val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) fp |= (1L << bit)
      bit += 1
    }
    fp
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass repetition profile for Gopher-style quality filters:
  * (n_words, n_distinct_words, top n-gram occurrence count, n_ngrams) from
  * a single tokenize + hash-count scan. The composable form (array_sort +
  * aggregate run-length lambda) interprets per element and sorts — O(k log
  * k) interpreted vs one O(k) JVM pass here; at 10^11 docs the repetition
  * filter is scan-bound, so this keeps it inside the scan stage's budget.
  * Counts are exact (hash map on the gram string, no hashing tricks), so
  * results are identical to the relational formulation DuckDB oracles use.
  */
case class RepetitionProfile(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_ngram_n", LongType, nullable = false),
    StructField("n_ngrams", LongType, nullable = false)))

  override def prettyName: String = "repetition_profile"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    val words = new java.util.HashSet[String]()
    var i = 0
    while (i < toks.length) { words.add(toks(i)); i += 1 }
    val grams = new java.util.HashMap[String, Long]()
    var top = 0L
    val nGrams = math.max(toks.length - n + 1, 0)
    val sb = new java.lang.StringBuilder
    i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val c = grams.merge(sb.toString, 1L, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      toks.length.toLong, words.size().toLong, top, nGrams.toLong)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Greedy longest-match subword segmentation — the WordPiece matching
  * algorithm (Wu et al. 2016) without the continuation-marker convention:
  * per whitespace word, repeatedly emit the LONGEST vocabulary piece
  * matching at the cursor; if nothing matches, emit "<unk>" and advance
  * one character. Pieces concatenate in document order. This is the
  * tokenizer-APPLY step (`bpePairStats` is the trainer side).
  *
  * One interpreted pass per row over a first-char-indexed vocab — pure
  * scan-stage work, zero shuffle: the scalable alternative (segment
  * DISTINCT words relationally, join back) shuffles every corpus token;
  * the oracle uses exactly that relational form (recursive CTE over the
  * distinct-word table), so the two independent formulations check each
  * other. Vocab is a plan constant; segmentation is deterministic (among
  * equal-length matches the matched text is identical, so longest-first
  * is a total rule).
  */
case class GreedyPieces(child: Expression, vocab: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "greedy_pieces"

  @transient private lazy val byFirst: Map[Char, Array[String]] =
    vocab.filter(_.nonEmpty).distinct.groupBy(_.head)
      .map { case (ch, ts) => ch -> ts.sortBy(t => -t.length).toArray }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      var pos = 0
      while (pos < w.length) {
        val cands = byFirst.getOrElse(w.charAt(pos), null)
        var hit: String = null
        if (cands != null) {
          var ci = 0
          while (hit == null && ci < cands.length) {
            if (w.startsWith(cands(ci), pos)) hit = cands(ci)
            ci += 1
          }
        }
        if (hit != null) { out += UTF8String.fromString(hit); pos += hit.length }
        else {
          // Advance one CODE POINT, not one UTF-16 unit: non-BMP input
          // (emoji, rare CJK) must yield one <unk> per character — the
          // relational oracle counts characters, and splitting surrogate
          // pairs would double-count.
          out += UTF8String.fromString("<unk>")
          pos += Character.charCount(w.codePointAt(pos))
        }
      }
      wi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One BPE merge step applied to a symbol array: every non-overlapping
  * adjacent (left, right) occurrence becomes the concatenated symbol,
  * scanning left to right — the exact update rule of Sennrich et al. 2016
  * BPE training. Runs over the DISTINCT-word table (vocabulary-bounded),
  * never the corpus, so the CodegenFallback virtual call is irrelevant;
  * the declarative alternative (aggregate-HOF fold with a pending-slot
  * struct) evaluates a lambda per element interpretively and cannot skip
  * the merged element. */
case class MergePair(child: Expression, left: String, right: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "merge_pair"

  @transient private lazy val l = UTF8String.fromString(left)
  @transient private lazy val r = UTF8String.fromString(right)
  @transient private lazy val lr = UTF8String.fromString(left + right)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      val cur = arr.getUTF8String(i)
      if (i + 1 < n && cur == l && arr.getUTF8String(i + 1) == r) {
        out += lr
        i += 2 // non-overlapping: the merged symbol cannot re-pair with itself
      } else {
        out += cur
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Longest common prefix of two suffixes of the SAME string: lcp_at(s,
  * p1, p2) = number of leading chars shared by s[p1..] and s[p2..]
  * (1-based positions; 0 when either position is outside the string).
  *
  * Companion to the suffix-array builder (`ops.SuffixArrays`): the LCP of
  * rank-adjacent suffixes is the classic route to repeated-substring
  * analysis (Manber & Myers 1990 §3), and evaluating it in place against
  * the ONE text value avoids materializing two suffix copies per pair —
  * the composable form `length(s)`-sized substrings per comparison —
  * in a doc-length² blowup. One tight char loop per row.
  */
case class LcpAt(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes with CodegenFallback {

  def str: Expression = first
  def p1: Expression = second
  def p2: Expression = third

  override def prettyName: String = "lcp_at"
  override def dataType: DataType = LongType
  // (narrowed to Seq[DataType]: AbstractDataType is private[sql])
  override def inputTypes: Seq[DataType] = Seq(StringType, LongType, LongType)

  override def nullSafeEval(s: Any, a: Any, b: Any): Any = {
    val text = s.asInstanceOf[UTF8String].toString
    val n = text.length
    val i0 = a.asInstanceOf[Long].toInt - 1
    val j0 = b.asInstanceOf[Long].toInt - 1
    if (i0 < 0 || j0 < 0 || i0 >= n || j0 >= n) 0L
    else {
      var k = 0
      while (i0 + k < n && j0 + k < n && text.charAt(i0 + k) == text.charAt(j0 + k)) k += 1
      k.toLong
    }
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** Longest common prefix of TWO strings: lcp_pair(a, b) = number of
  * leading chars shared. Companion to [[LcpAt]] for the cross-document
  * case, where the two suffixes live in different texts and a
  * single-string in-place compare cannot reach both; callers pass the
  * (cap-bounded) suffix substrings, so the materialization this allows
  * is one cap-sized string per side per pair — the Lee et al. 2022
  * cross-doc span-detection cost profile. */
case class LcpPair(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def prettyName: String = "lcp_pair"
  override def dataType: DataType = LongType
  // (narrowed to Seq[DataType]: AbstractDataType is private[sql])
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].toString
    val b = r.asInstanceOf[UTF8String].toString
    val n = math.min(a.length, b.length)
    var k = 0
    while (k < n && a.charAt(k) == b.charAt(k)) k += 1
    k.toLong
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Jaro–Winkler similarity (Winkler 1990) — the record-linkage string
  * measure: Jaro match/transposition score boosted by up to 4 chars of
  * common prefix when the base score exceeds 0.7. Semantics pinned to
  * the textbook definition as implemented by DuckDB's
  * `jaro_winkler_similarity` (oracle parity for q_fuzzy_match):
  * either side empty → 0.0, boost only when jaro > 0.7, prefix capped
  * at 4, scaling 0.1. One O(len·window) pass with two small flag
  * arrays per row; chars compared as UTF-16 units (identical to
  * byte order on the ASCII names this serves).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {

  override def prettyName: String = "jaro_winkler"
  override def dataType: DataType = DoubleType
  // (narrowed to Seq[DataType]: AbstractDataType is private[sql])
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)

  override def nullSafeEval(l: Any, r: Any): Any =
    jw(l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)

  private def jw(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var trans = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val mD = m.toDouble
    val jaro = (mD / l1 + mD / l2 + (mD - trans / 2.0) / mD) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val maxP = math.min(4, math.min(l1, l2))
      var p = 0
      while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Shared md5 bit-slicing for the PORTABLE hash lanes — the oracle-checkable
  * convention (ops/Hll precedent): h1 = first 15 hex chars of the digest as
  * a 60-bit long (`('0x' || substr(md5(s),1,15))::BIGINT` in any engine),
  * h2 = the following 8 hex chars as a 32-bit long. Computed here straight
  * from the digest BYTES — hex chars 1..15 are bytes 0..6 plus the high
  * nibble of byte 7; chars 16..23 are the low nibble of byte 7, bytes
  * 8..10, and the high nibble of byte 11 — skipping the hex-string and
  * decimal-conv detours the composable form paid per element. */
private[plans] object PortableMd5 {
  def digest(s: UTF8String): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)

  def h1(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  def h2(d: Array[Byte]): Long =
    ((d(7) & 0xfL) << 28) | ((d(8) & 0xffL) << 20) |
      ((d(9) & 0xffL) << 12) | ((d(10) & 0xffL) << 4) | ((d(11) >> 4) & 0xfL)

  /** Back-half 60-bit lane: hex chars 17..31 of the digest as a long —
    * the SECOND independent lane [[PortableSimHash120]] widens the
    * fingerprint with (`('0x' || substring(md5(t), 17, 15))::BIGINT` in
    * the oracle). Bytes 8..14 plus the high nibble of byte 15, the exact
    * mirror of [[h1]] over the digest's back half. */
  def h3(d: Array[Byte]): Long = {
    var v = 0L
    var i = 8
    while (i < 15) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(15) >> 4) & 0xfL)
  }
}

/** Portable MinHash signature: per shingle ONE md5 split into (h1, h2),
  * position i of the signature = min over shingles of h1 + i·h2
  * (Kirsch–Mitzenmacher 2006). Values identical to the composable
  * `conv(substring(md5(s),…),16,10)` formulation (spec-pinned) and to the
  * DuckDB oracle — this is the same single-pass fusion [[MinHashSig]] does
  * for the engine-private xxhash64 lane. */
case class PortableMinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "portable_minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val nEl = arr.numElements()
    while (i < nEl) {
      val d = PortableMd5.digest(arr.getUTF8String(i))
      val h1 = PortableMd5.h1(d)
      val h2 = PortableMd5.h2(d)
      var j = 0
      while (j < k) {
        val h = h1 + j * h2 // < 2^60 + k·2^32: no overflow in any engine
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box): Array[Any])
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Portable SimHash: 60-bit bit-vote fingerprint over distinct whitespace
  * tokens, each hashed to the md5 60-bit prefix — tokenize + digest + vote
  * fused into one pass (the portable twin of [[SimHash64]]; the composable
  * form folded the hash array once per bit = 60 interpreted passes).
  * Token-less input yields NULL (the caller's drop-empty contract — every
  * engine must agree such docs emit nothing, not a zero fingerprint). */
case class PortableSimHash60(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "portable_simhash60"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](60)
    var i = 0
    var any = false
    while (i < toks.length) {
      if (toks(i).nonEmpty && seen.add(toks(i))) {
        any = true
        val h = PortableMd5.h1(PortableMd5.digest(UTF8String.fromString(toks(i))))
        var bit = 0
        while (bit < 60) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    if (!any) null
    else {
      var fp = 0L
      var bit = 0
      while (bit < 60) {
        if (votes(bit) > 0) fp |= (1L << bit)
        bit += 1
      }
      fp
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Portable SimHash at PRODUCTION width: a 120-bit fingerprint as TWO
  * 60-bit md5 lanes — lane 0 votes on the digest's front 60 bits
  * ([[PortableMd5.h1]], the [[PortableSimHash60]] lane unchanged), lane 1
  * on its back 60 ([[PortableMd5.h3]], hex chars 17..31) — one digest per
  * distinct token feeding both lanes, so widening costs no extra md5
  * passes. Returns `array(fp0, fp1)`; NULL for token-less input (the
  * 60-bit contract). Why a second lane instead of more chunks at 60 bits:
  * the candidate census is Σ over chunk buckets of C(n,2), quadratic in
  * corpus at FIXED chunk width (measured: SCALE_DECADE_r15 slope2 13.5×
  * for the 60-bit/15-bit-chunk registry form) — 120 bits lets the blocker
  * run 20-bit chunks (2^20 bucket space, 32× the 15-bit form) while
  * KEEPING the pigeonhole guarantee at 6 chunks. */
case class PortableSimHash120(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "portable_simhash120"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](120)
    var i = 0
    var any = false
    while (i < toks.length) {
      if (toks(i).nonEmpty && seen.add(toks(i))) {
        any = true
        val d = PortableMd5.digest(UTF8String.fromString(toks(i)))
        val hA = PortableMd5.h1(d)
        val hB = PortableMd5.h3(d)
        var bit = 0
        while (bit < 60) {
          if (((hA >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          if (((hB >>> bit) & 1L) == 1L) votes(60 + bit) += 1
          else votes(60 + bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    if (!any) null
    else {
      var fp0 = 0L
      var fp1 = 0L
      var bit = 0
      while (bit < 60) {
        if (votes(bit) > 0) fp0 |= (1L << bit)
        if (votes(60 + bit) > 0) fp1 |= (1L << bit)
        bit += 1
      }
      new GenericArrayData(Array[Any](fp0, fp1))
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unicode NFC normalization — canonical composition via
  * `java.text.Normalizer` (the JDK's ICU-equivalent tables). The
  * dedup-correctness primitive web text needs before ANY exact or
  * hash-based comparison: "é" arrives both precomposed (U+00E9) and
  * decomposed (e + U+0301) in real crawls, and every md5/xxhash lane in
  * this repo would treat them as different documents. Fast path: scan
  * once with `Normalizer.isNormalized` (true for pure-ASCII and most
  * Latin text) and return the INPUT UTF8String unchanged — no
  * allocation; only rows that actually carry decomposed sequences pay
  * the recomposition. DuckDB's `nfc_normalize` implements the same UAX
  * #15 transform, giving the oracle lane. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str,
      java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Row kernels for the marker-counting expressions, public because the
  * generated code calls them as statics (one call per row — these
  * expressions implement real `doGenCode`, keeping the curation scan's
  * Project inside whole-stage codegen, unlike the CodegenFallback tier
  * above whose presence in a Project disables codegen for the operator).
  * Counting is non-overlapping occurrences of `" w "` in `" text "`,
  * left to right — bit-identical to the SQL replace trick
  * `(len(p) − len(replace(p, ' w ', ''))) / len(' w ')` the oracles spell
  * (adjacent repeats share a delimiter space and count once per pair,
  * exactly like replace). */
object MarkerOps {
  def count(padded: String, needle: String): Long = {
    var n = 0L
    var from = padded.indexOf(needle)
    while (from >= 0) {
      n += 1
      from = padded.indexOf(needle, from + needle.length)
    }
    n
  }

  /** argmax language with greatest(struct(score, lang)) semantics:
    * higher score wins, equal score → lexicographically greater lang. */
  def best(text: UTF8String, langs: Array[String],
      needles: Array[Array[String]]): UTF8String = {
    val padded = " " + text.toString + " "
    var bestScore = 0L
    var bestLang: String = null
    var i = 0
    while (i < langs.length) {
      var s = 0L
      val ns = needles(i)
      var j = 0
      while (j < ns.length) { s += count(padded, ns(j)); j += 1 }
      if (bestLang == null || s > bestScore ||
          (s == bestScore && langs(i).compareTo(bestLang) > 0)) {
        bestScore = s; bestLang = langs(i)
      }
      i += 1
    }
    UTF8String.fromString(if (bestScore > 0) bestLang else "unk")
  }

  def hits(text: UTF8String, needles: Array[String]): Long = {
    val padded = " " + text.toString + " "
    var s = 0L
    var j = 0
    while (j < needles.length) { s += count(padded, needles(j)); j += 1 }
    s
  }
}

/** Marker-based language ID in ONE pass per row: per-language stopword
  * counts + argmax with the (score, lang)-lexicographic tiebreak of
  * `greatest(struct(score, lang))`, 'unk' when no marker hits.
  *
  * Replaces the column-composed form (16 markers × the countOccurrences
  * replace trick = 32 textual references to the input), whose expression
  * tree re-inlined any upstream derivation — compose it over
  * `normalizeText` and the normalize chain was duplicated 32×, blowing
  * the Janino 64 KB method limit and dropping the hottest curation scan
  * out of whole-stage codegen. Here the input is evaluated once and the
  * fallback call is a single tight JVM loop. Values are unchanged
  * (q_lang_id's DuckDB oracle spells the replace-trick arithmetic). */
case class MarkerBest(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "marker_best"

  @transient private lazy val langs: Array[String] = markers.map(_._1).toArray
  @transient private lazy val needles: Array[Array[String]] =
    markers.map(_._2.map(w => s" $w ").toArray).toArray

  override def nullSafeEval(input: Any): Any =
    MarkerOps.best(input.asInstanceOf[UTF8String], langs, needles)

  // Real codegen (one static call per row) — CodegenFallback would be
  // fine for the FALLBACK-tier expressions above, but a Project containing
  // any CodegenFallback is excluded from whole-stage codegen entirely,
  // and this expression sits in the curation pipeline's hottest scan.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val langsRef = ctx.addReferenceObj("langs", langs, "java.lang.String[]")
    val needlesRef =
      ctx.addReferenceObj("needles", needles, "java.lang.String[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MarkerOps.best($c, $langsRef, $needlesRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Total non-overlapping `" w "` hits across a word list, one pass —
  * the native form of stopwordCount for the same reason as [[MarkerBest]]
  * (8 stopwords × replace trick = 16 references to the input text). */
case class MarkerHits(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "marker_hits"

  @transient private lazy val needles: Array[String] =
    words.map(w => s" $w ").toArray

  override def nullSafeEval(input: Any): Any =
    MarkerOps.hits(input.asInstanceOf[UTF8String], needles)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val needlesRef =
      ctx.addReferenceObj("needles", needles, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MarkerOps.hits($c, $needlesRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused winnowing fingerprint selection (Schleimer et al. 2003) —
  * normalized text in, array of DISTINCT window-minimum md5 HEX
  * fingerprints out, one JVM pass per document.
  *
  * Semantically identical to the composed SQL form it replaces in
  * [[graft.ops.Winnow.fingerprints]] (md5 hex of every k-gram of the
  * first `maxChars` chars, `array_min` per w-window, `array_distinct`,
  * first-occurrence order — lexicographic hex order IS unsigned byte
  * order of the digest, so comparing raw 16-byte digests selects the
  * identical minima), but the composed form paid, per position, one hex
  * UTF8String allocation (md5), one w-element `slice` array allocation
  * and an O(w) `array_min` scan — O(n·w) work and O(n) garbage per
  * document. Here: digests land in ONE flat byte buffer (n·16 B), the
  * sliding minimum is a monotonic deque (O(n) total comparisons), and
  * only the ~2n/(w+1) WINNERS are hex-formatted. The r17 sf10 probe
  * measured the fingerprint stage GC-bound at 3× its linear expectation
  * under the composed form; allocation ∝ winners (not grams) is the fix
  * that scales. Input must be the [[graft.ops.Winnow.normalize]]d string
  * ([a-z0-9]*, pure ASCII — char positions = byte positions, which is
  * what lets the gram slice skip UTF-8 decoding). */
case class WinnowFingerprints(child: Expression, k: Int, w: Int, maxChars: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  private val hexDigits = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val len = math.min(bytes.length, maxChars)
    val n = len - k + 1
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val flat = new Array[Byte](n * 16)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(bytes, i, k)
      md.digest(flat, i * 16, 16)
      i += 1
    }
    @inline def le(a: Int, b: Int): Boolean = { // flat[a] <= flat[b] unsigned
      var j = 0
      while (j < 16) {
        val x = flat(a * 16 + j) & 0xff
        val y = flat(b * 16 + j) & 0xff
        if (x != y) return x < y
        j += 1
      }
      true
    }
    val dq = new Array[Int](n)
    var h = 0
    var t = 0
    var lastIdx = -1
    val seen = new java.util.LinkedHashSet[String]()
    var p = 0
    while (p < n) {
      while (t > h && le(p, dq(t - 1))) t -= 1 // pop ≥ tail (ties keep later)
      dq(t) = p; t += 1
      if (dq(h) <= p - w) h += 1
      if (p >= w - 1 && dq(h) != lastIdx) {
        lastIdx = dq(h)
        val sb = new java.lang.StringBuilder(32)
        var j = 0
        while (j < 16) {
          val v = flat(lastIdx * 16 + j) & 0xff
          sb.append(hexDigits(v >>> 4)).append(hexDigits(v & 0xf))
          j += 1
        }
        seen.add(sb.toString)
      }
      p += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Content-defined chunking cut positions (round-19 optimization of
  * [[graft.ops.Chunking.cdcChunks]]'s boundary scan): one pass over the
  * text computing, at every char position p in [1, n−k+1], the md5 of
  * the k-CHAR gram starting at p, marking a boundary when the digest's
  * top 60 bits (= its first 15 hex digits, the portable
  * conv(substring(md5(…),1,15),16,10) lane) are ≡ 0 mod (mask+1).
  * Returns the sorted distinct cut array [0, boundaries (p+k−1), n]
  * with n = min(numChars, maxChars) — bit-identical to the previous
  * column formula (same grams, same md5 prefix arithmetic, same cut
  * placement) but ONE MessageDigest reused across positions and zero
  * hex-string/conv round-trips per gram (the formula allocated a
  * substring, a 32-char hex string and a decimal-parse per position).
  * Input shorter than k chars yields NULL (the caller filters those
  * rows out before chunk assembly). */
case class CdcCuts(child: Expression, k: Int, mask: Int, maxChars: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cdc_cuts"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    // char→byte offsets (identity for ASCII); gram md5 runs over the
    // UTF-8 bytes of the k-CHAR substring, matching substring() semantics
    val nCharsAll = s.numChars()
    val n = math.min(nCharsAll, maxChars)
    if (n < k) return null
    val offs = new Array[Int](n + 1)
    var ci = 0
    var bi = 0
    while (ci < n) {
      offs(ci) = bi
      val b = bytes(bi) & 0xff
      bi += (if (b < 0x80) 1 else if (b < 0xe0) 2 else if (b < 0xf0) 3 else 4)
      ci += 1
    }
    offs(n) = bi
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = new Array[Byte](16)
    val cuts = new scala.collection.mutable.ArrayBuffer[Int]()
    cuts += 0
    var p = 0 // 0-based char position of the gram start
    val lastStart = n - k
    while (p <= lastStart) {
      md.reset()
      md.update(bytes, offs(p), offs(p + k) - offs(p))
      md.digest(dig, 0, 16)
      var top = 0L // first 8 bytes big-endian
      var j = 0
      while (j < 8) { top = (top << 8) | (dig(j) & 0xffL); j += 1 }
      // first 15 hex digits = top 60 bits
      if (((top >>> 4) % (mask + 1)) == 0L) {
        val cut = p + k // 1-based boundary position p+1 plus (k-1)
        if (cuts.last != cut) cuts += cut
      }
      p += 1
    }
    if (cuts.last != n) cuts += n
    new GenericArrayData(cuts.toArray.map(Int.box): Array[Any])
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextNative {
  import ColumnBridge.{column => c, expression => e}

  def wordShingles(text: Column, n: Int): Column = c(WordShingles(e(text), n))
  def nfcNormalize(text: Column): Column = c(NfcNormalize(e(text)))
  def minhashSig(shingleArr: Column, k: Int): Column = c(MinHashSig(e(shingleArr), k))
  def simhash64(text: Column): Column = c(SimHash64(e(text)))
  def repetitionProfile(text: Column, n: Int): Column = c(RepetitionProfile(e(text), n))
  def greedyPieces(text: Column, vocab: Seq[String]): Column = c(GreedyPieces(e(text), vocab))
  def mergePair(pieces: Column, left: String, right: String): Column =
    c(MergePair(e(pieces), left, right))
  def lcpAt(text: Column, p1: Column, p2: Column): Column =
    c(LcpAt(e(text), e(p1), e(p2)))
  def jaroWinkler(a: Column, b: Column): Column =
    c(JaroWinkler(e(a), e(b)))
  def lcpPair(a: Column, b: Column): Column =
    c(LcpPair(e(a), e(b)))
  def portableMinhashSig(shingleArr: Column, k: Int): Column =
    c(PortableMinHashSig(e(shingleArr), k))
  def portableSimhash60(text: Column): Column =
    c(PortableSimHash60(e(text)))
  def portableSimhash120(text: Column): Column =
    c(PortableSimHash120(e(text)))
  def markerBest(text: Column, markers: Seq[(String, Seq[String])]): Column =
    c(MarkerBest(e(text), markers))
  def markerHits(text: Column, words: Seq[String]): Column =
    c(MarkerHits(e(text), words))
  def winnowFps(normalized: Column, k: Int, w: Int, maxChars: Int): Column =
    c(WinnowFingerprints(e(normalized), k, w, maxChars))
  def cdcCuts(text: Column, k: Int, mask: Int, maxChars: Int): Column =
    c(CdcCuts(e(text), k, mask, maxChars))
}
