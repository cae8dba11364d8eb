package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting, shingling, MinHash and
  * SimHash signatures. Pure expressions (codegen) — per-row cost only, no
  * shuffle; at 100 TB these run inside the scan stage.
  */
object TextFunctions {
  /** HTML/markup stripping — the boilerplate-removal step between a raw
    * web crawl and every text operator in this package: drop
    * script/style blocks wholesale (their CONTENT is code, not prose),
    * remove remaining tags, decode the five core character entities
    * (amp LAST, so `&amp;lt;` decodes to the literal `&lt;` and not to
    * `<` — the standard anti-double-decode ordering), collapse
    * whitespace. Pure chained regexp_replace — scan-stage, zero shuffle,
    * and every pattern is shared Java-regex/RE2 syntax so a SQL oracle
    * can replay the identical chain.
    *
    * This is the regex tier (NCSA-style cleaning), not a spec-complete
    * HTML5 parser: CDATA, conditional comments and malformed nesting
    * degrade gracefully (tags still stripped) rather than exactly. */
  def stripMarkup(text: Column): Column = {
    val noScript = regexp_replace(text, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val ent = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(from), to) }
    trim(regexp_replace(ent, "\\s+", " "))
  }


  /** Occurrences of `needle` in `hay` via the replace trick (portable to any
    * SQL engine, no regex engine differences). */
  def countOccurrences(hay: Column, needle: String): Column =
    ((length(hay) - length(regexp_replace(hay, java.util.regex.Pattern.quote(needle), ""))) / needle.length).cast("long")

  /** Whitespace token count. Empty/blank → 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish subword count: alpha runs, digit runs, and single non-space
    * symbols each count as one token. */
  def bpeIshTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long")

  /** Marker-based language ID: counts per-language stopword markers and
    * returns the argmax language, 'unk' when nothing matches. N-gram
    * heuristic in the spirit of fastText-style scoring, expressible in one
    * CASE chain. */
  def langId(text: Column, markers: Map[String, Seq[String]]): Column =
    // Native one-pass expression ([[graft.plans.MarkerBest]]): the
    // column-composed form (16 markers × the countOccurrences replace
    // trick) referenced `text` 32 times, and composing it over
    // normalizeText re-inlined the whole normalize chain 32× — past the
    // Janino 64 KB method limit, dropping the curation scan out of
    // whole-stage codegen. Same values (greatest(struct(score, lang))
    // argmax over replace-trick counts, 'unk' when nothing matches).
    // coalesce: MarkerBest is null-in/null-out (nullSafeEval) but the
    // column-composed form it replaced returned 'unk' for NULL text (the
    // null score structs fell through to the otherwise branch) — keep
    // that contract for nullable corpus columns. stopwordCount needs no
    // wrapper: its old +-chain form was null-propagating, same as
    // MarkerHits.
    coalesce(graft.plans.TextNative.markerBest(text, markers.toSeq), lit("unk"))

  /** Default marker sets for the corpus languages. */
  val defaultMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "fr" -> Seq("le", "la", "et", "de"),
    "de" -> Seq("der", "die", "und", "das"),
    "es" -> Seq("el", "los", "y", "que"))

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[.,;:!?'\"()\\[\\]{}-]")).cast("long")

  /** Stopword hits (space-delimited exact matches). Native one-pass
    * ([[graft.plans.MarkerHits]]) for the same expression-reuse reason as
    * [[langId]]: the replace-trick form referenced `text` 2× per word. */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    graft.plans.TextNative.markerHits(text, stopwords)

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Heuristic quality score in [0,1]: rewards reasonable length and
    * stopword presence, penalizes punctuation soup. Deterministic,
    * SQL-portable arithmetic. */
  def qualityScore(text: Column): Column = {
    val n = length(text).cast("double")
    val toks = tokenCount(text).cast("double")
    val lenScore = least(n / lit(500.0), lit(1.0))
    val stopRatio = stopwordCount(text, defaultStopwords).cast("double") /
      greatest(toks, lit(1.0))
    val punctRatio = punctCount(text).cast("double") / greatest(n, lit(1.0))
    least(greatest(
      lenScore * lit(0.5) + least(stopRatio * lit(5.0), lit(1.0)) * lit(0.5)
        - punctRatio * lit(2.0),
      lit(0.0)), lit(1.0))
  }

  /** Bit-deterministic 4-decimal rounding for ratio values (Spark round()
    * and DuckDB round() disagree on .00005 boundaries). */
  def r4ratio(x: Column): Column = floor(x * 10000 + lit(0.5)) / 10000

  /** Gopher-style structural quality rules (Rae et al. 2021, appendix A —
    * the rule battery later popularized by Dolma/FineWeb): per-document
    * word count, mean word length, symbol-to-word ratio (`#` and `...`),
    * alphabetic-word fraction, stopword hits, and the composite keep
    * verdict. Complements [[repetitionStats]] (the repetition half of the
    * Gopher battery). Thresholds are the published defaults; pass others
    * to tune. Pure scan-stage column math — at 100 TB this is a
    * projection fused into the parquet scan: no shuffle, no UDF, and the
    * verdict can drive a pushed-down filter.
    *
    * Emitted columns: `n_words`, `mean_word_len`, `symbol_ratio`,
    * `alpha_frac`, `stop_hits`, `gopher_pass` (BIGINT 0/1 — engine-
    * portable, unlike booleans). */
  def gopherStats(
      text: Column,
      stopwords: Seq[String] = defaultStopwords,
      minWords: Long = 50,
      maxWords: Long = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minAlphaFrac: Double = 0.8,
      minStopHits: Long = 2): Seq[Column] = {
    val toks = tokenCount(text)
    val toksD = greatest(toks, lit(1L)).cast("double")
    val nonSpace = length(regexp_replace(text, "\\s", "")).cast("double")
    val meanLen = r4ratio(nonSpace / toksD)
    val symbols = countOccurrences(text, "#") + countOccurrences(text, "...")
    val symRatio = r4ratio(symbols.cast("double") / toksD)
    val alphaWords =
      size(filter(split(trim(text), "\\s+"), w => w.rlike("[A-Za-z]"))).cast("long")
    val alphaFrac = r4ratio(alphaWords.cast("double") / toksD)
    val stops = stopwordCount(text, stopwords)
    val pass = (toks >= minWords && toks <= maxWords &&
      meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen &&
      symRatio <= maxSymbolRatio && alphaFrac >= minAlphaFrac &&
      stops >= minStopHits).cast("long")
    Seq(
      toks.as("n_words"),
      meanLen.as("mean_word_len"),
      symRatio.as("symbol_ratio"),
      alphaFrac.as("alpha_frac"),
      stops.as("stop_hits"),
      pass.as("gopher_pass"))
  }

  /** Word-repetition profile (Gopher-style quality filters): fraction of
    * duplicated words and occurrence count of the most repeated word
    * bigram, from ONE native one-pass expression (graft.plans.
    * RepetitionProfile) — no explode, no shuffle, which is what lets a
    * repetition filter over 10^11 docs stay a plain scan-stage projection.
    * Materialize this column in its own select, then derive the metric
    * columns with [[repetitionMetrics]] — referencing the profile k times
    * in the SAME projection would inline (recompute) it k times. */
  def repetitionStats(text: Column): Seq[Column] = {
    val p = graft.plans.TextNative.repetitionProfile(text, 2)
    Seq(p.as("__rep"))
  }

  /** Derived metric columns over the materialized profile column. */
  def repetitionMetrics(rep: Column): Seq[Column] = {
    val nWords = rep.getField("n_words")
    val nDistinct = rep.getField("n_distinct")
    val top = rep.getField("top_ngram_n")
    val nGrams = rep.getField("n_ngrams")
    Seq(
      nWords.as("n_words"),
      nDistinct.as("n_distinct"),
      r4ratio(lit(1.0) - nDistinct.cast("double") /
        greatest(nWords, lit(1L)).cast("double")).as("dup_word_frac"),
      top.as("top_bigram_n"),
      r4ratio(top.cast("double") /
        greatest(nGrams, lit(1L)).cast("double")).as("top_bigram_frac"))
  }

  /** PII scrubbing: redact emails, phone-shaped numbers and long digit
    * runs (ids/cards). Pure regexp_replace chain — runs inside the scan. */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val phone = regexp_replace(email,
      "\\+?[0-9]{3}[- .][0-9]{3,4}[- .][0-9]{4}", "<PHONE>")
    regexp_replace(phone, "[0-9]{9,}", "<ID>")
  }

  /** Heuristic English syllable count of a lowercase word: the number of
    * [aeiouy]+ vowel runs, minus one for a silent final 'e' (ends in
    * 'e' but not 'le', with ≥ 2 runs), floored at 1 — the standard
    * readability-formula approximation (exact syllabification needs a
    * dictionary; the formulas were CALIBRATED against counts like this).
    * Deterministic scalar math, mirrored textually by oracles. */
  def syllables(word: Column): Column = {
    val runs = size(regexp_extract_all(word, lit("[aeiouy]+"), lit(0)))
    greatest(
      when(word.rlike("e$") && !word.rlike("le$") && runs >= 2, runs - 1)
        .otherwise(runs),
      lit(1))
  }

  /** Luhn checksum validity (ISO/IEC 7812) of an all-digit string: from
    * the right, every second digit doubles (−9 when > 9) and the total
    * must divide by 10 — the check that separates a real card/IMEI-shaped
    * number from a random digit run, cutting PII false positives by ~10×.
    * Pure higher-order column math (reverse → per-position fold), no UDF,
    * portable to any engine with list_transform/aggregate. */
  def luhnValid(digits: Column): Column = {
    val rev = reverse(digits)
    val vals = transform(sequence(lit(1), length(rev)), i => {
      val d = ascii(rev.substr(i, lit(1))) - 48
      when(i % 2 === 0,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
    aggregate(vals, lit(0), (a, x) => a + x) % 10 === 0
  }

  /** Text normalization: lowercase, collapse whitespace, strip control
    * chars — the canonical pre-tokenization cleanup. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text),
      "[\\x00-\\x1f]", " "), "\\s+", " "))

  /** Normalization fingerprint: lowercase → tokens → distinct → sort →
    * md5. Near-identical docs that differ only in token order/duplication
    * collide (the classic "fingerprint" clustering key). */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(split(lower(trim(text)), "\\s+"))), " "))

  /** Word n-gram shingles as a distinct string array (native expression —
    * graft.plans.WordShingles — one pass per row). */
  def shingles(text: Column, n: Int): Column =
    graft.plans.TextNative.wordShingles(text, n)

  /** BPE pair statistics — the reduce step of distributed tokenizer
    * training (Sennrich et al. 2016): the k most frequent ADJACENT symbol
    * pairs over the corpus, weighted by word frequency. One merge round =
    * this + a driver-side merge decision (the same tiny-parameter loop
    * shape as k-means/CC); the corpus-heavy part is exactly this operator.
    *
    * Scale shape: the word-frequency aggregation collapses the corpus to
    * its VOCABULARY map-side (partial agg on the word; Zipf means a few
    * million rows survive no matter the corpus size); pair explosion then
    * runs over distinct words only — work proportional to vocabulary, not
    * corpus. Final top-k is a `TakeOrderedAndProject` of the tiny pair
    * table. Ties break on the pair string for determinism. */
  def bpePairStats(
      df: org.apache.spark.sql.DataFrame, textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    val words = df
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 1)
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    words
      .select(col("wc"), explode(
        transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("wc")).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(k)
  }

  /** MinHash signature: k xxhash64 permutations minimized in a single pass
    * over the shingles (native expression, graft.plans.MinHashSig). */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    graft.plans.TextNative.minhashSig(shingleArr, k)

  /** LSH band hashes from a MinHash signature: b bands of r rows; a band's
    * hash is xxhash64 over its slice. Returns array of (bandId, bandHash)
    * structs for explode+join — shuffles k/r rows per doc, never pairs. */
  def lshBands(signature: Column, b: Int, r: Int): Column =
    array((0 until b).map { band =>
      struct(
        lit(band).as("band"),
        xxhash64(lit(band) +: (0 until r).map(i =>
          element_at(signature, band * r + i + 1)): _*).as("band_hash"))
    }: _*)

  /** Token xxhash64 array for SimHash. Materialize this into its own
    * projection before calling [[simhashFromHashes]] — the fingerprint
    * references the array 64 times, and a pre-materialized attribute keeps
    * Catalyst from inlining (and so recomputing) the tokenization 64×. */
  def tokenHashes(text: Column): Column =
    transform(array_distinct(split(trim(text), "\\s+")), t => xxhash64(t))

  /** SimHash: 64-bit fingerprint by bit-voting over token hashes. */
  def simhashFromHashes(hashes: Column): Column =
    (0 until 64).map { bit =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** SimHash directly from text — fused native expression
    * (graft.plans.SimHash64): tokenize + hash + 64-bit vote in one pass. */
  def simhash(text: Column): Column = graft.plans.TextNative.simhash64(text)

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash blocking key array: split the `bits`-wide fingerprint into
    * `chunks` equal bit-chunks; near-dups within hamming < chunks must
    * share ≥1 chunk (pigeonhole) — join on chunk value, never all-pairs.
    * `bits` is 64 for the native fingerprint, 60 for the portable md5 one
    * (15 hex chars). */
  def simhashChunks(fp: Column, chunks: Int, bits: Int = 64): Column = {
    val width = bits / chunks
    val mask = (1L << width) - 1
    array((0 until chunks).map { i =>
      struct(lit(i).as("chunk"),
        shiftright(fp, i * width).bitwiseAND(mask).as("chunk_val"))
    }: _*)
  }

  /** Unicode script classes for [[scriptCounts]]/[[dominantScript]]:
    * (name, BMP codepoint ranges). Listed order IS the dominance
    * tiebreak priority. Kept to character-class ranges both Java regex
    * and RE2 express, so an oracle can mirror the counts exactly. */
  val scriptClasses: Seq[(String, Seq[(Int, Int)])] = Seq(
    "latin" -> Seq(0x41 -> 0x5A, 0x61 -> 0x7A, 0xC0 -> 0x24F),
    "cyrillic" -> Seq(0x400 -> 0x4FF),
    "greek" -> Seq(0x370 -> 0x3FF),
    "cjk" -> Seq(0x3040 -> 0x30FF, 0x4E00 -> 0x9FFF),
    "arabic" -> Seq(0x600 -> 0x6FF),
    "hebrew" -> Seq(0x590 -> 0x5FF),
    "devanagari" -> Seq(0x900 -> 0x97F))

  private def javaClass(ranges: Seq[(Int, Int)]): String =
    ranges.map { case (a, b) => f"\\u$a%04x-\\u$b%04x" }.mkString("[", "", "]")

  /** Per-script character count: chars *outside* the class are deleted
    * and the survivors counted — one scan-stage regexp per class, no
    * explode. Count = length(text) − length(text without class chars). */
  def scriptCount(text: Column, ranges: Seq[(Int, Int)]): Column =
    (length(text) - length(regexp_replace(text, javaClass(ranges), "")))
      .cast("long")

  /** Dominant script among [[scriptClasses]]: the first class in
    * priority order whose count is ≥ every later class's count — which
    * is exactly "first occurrence of the maximum" (classes before the
    * max each fail against it). All-zero → 'none'.
    *
    * The raw count expressions are STAGED through the array()/flatten
    * let-binding before the dominance chain reads them: passed inline,
    * CollapseProject would inline each count (a regexp_replace scan of
    * the whole text) into every CASE comparison — the expression-reuse
    * trap this repo has measured at 10-15x elsewhere. Here each count
    * evaluates once per row; the chain compares lambda-bound array
    * elements. */
  def dominantScript(counts: Seq[(String, Column)]): Column = {
    val names = counts.map(_._1)
    def chainOver(a: Column): Column =
      names.zipWithIndex.foldRight(lit("none"): Column) {
        case ((name, i), acc) =>
          val c = element_at(a, i + 1)
          val rest = (i + 1 until names.size).map(j => element_at(a, j + 1))
          val beatsRest = rest match {
            case Seq() => c > 0
            case Seq(one) => c > 0 && c >= one // greatest() needs ≥ 2 args
            case many => c > 0 && c >= greatest(many: _*)
          }
          when(beatsRest, lit(name)).otherwise(acc)
      }
    element_at(
      transform(array(array(counts.map(_._2): _*)), a => chainOver(a)), 1)
  }
}
