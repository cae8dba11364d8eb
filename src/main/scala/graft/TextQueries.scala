package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import Queries.Q

/** Text-analysis queries over the documents table (§2.6). */
object TextQueries {

  /** Marker-based language ID. The oracle replicates the scoring formula
    * (occurrence counting via the replace trick) so both engines compute
    * the identical deterministic heuristic. */
  val qLangId = Q(
    "q_lang_id",
    (s, dir) => {
      Tables(s, dir).documents.select(
        col("doc_id"),
        langId(col("text"), defaultMarkers).as("lang_pred"))
    },
    Some {
      // per-language score: sum of marker occurrences in ' '||text||' '
      def score(words: Seq[String]): String = words.map { w =>
        s"CAST((length(p) - length(replace(p, ' $w ', ''))) / ${w.length + 2} AS BIGINT)"
      }.mkString(" + ")
      val langs = Seq( // keep in sync with TextFunctions.defaultMarkers
        "en" -> Seq("the", "a", "of", "and"),
        "fr" -> Seq("le", "la", "et", "de"),
        "de" -> Seq("der", "die", "und", "das"),
        "es" -> Seq("el", "los", "y", "que"))
      val unions = langs.map { case (l, ws) =>
        s"SELECT doc_id, '$l' AS lang, ${score(ws)} AS score FROM padded"
      }.mkString(" UNION ALL ")
      s"""WITH padded AS (SELECT doc_id, ' ' || text || ' ' AS p FROM documents),
            scores AS ($unions),
            best AS (
              SELECT doc_id, max({'score': score, 'lang': lang}) AS b
              FROM scores GROUP BY doc_id)
          SELECT doc_id,
            CASE WHEN b.score > 0 THEN b.lang ELSE 'unk' END AS lang_pred
          FROM best"""
    })

  /** Quality scoring: length/punctuation/stopword-ratio formula.
    * Quantized as floor(x·10⁴+0.5)/10⁴ rather than round(): the formula's
    * rational arithmetic can land exactly on .00005 boundaries where
    * engines' round() tie-handling differs; floor of identical doubles is
    * bit-deterministic. */
  val qQualityScore = Q(
    "q_quality_score",
    (s, dir) => {
      Tables(s, dir).documents.select(
        col("doc_id"),
        (floor(qualityScore(col("text")) * 10000 + 0.5) / 10000).as("quality"))
    },
    Some {
      val stop = defaultStopwords.map { w =>
        s"CAST((length(p) - length(replace(p, ' $w ', ''))) / ${w.length + 2} AS BIGINT)"
      }.mkString(" + ")
      s"""SELECT doc_id, floor(
            least(greatest(
              least(length(text) / 500.0, 1.0) * 0.5
              + least((($stop) / greatest(ntok, 1.0)) * 5.0, 1.0) * 0.5
              - (npunct / greatest(length(text)::DOUBLE, 1.0)) * 2.0,
            0.0), 1.0) * 10000 + 0.5) / 10000 AS quality
          FROM (
            SELECT doc_id, text, ' ' || text || ' ' AS p,
              CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE len(string_split_regex(trim(text), '\\s+')) END::DOUBLE AS ntok,
              len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]{}-]'))::DOUBLE AS npunct
            FROM documents)"""
    })

  /** Token counting: whitespace tokens + BPE-ish subword regex tokens. */
  val qTokenCount = Q(
    "q_token_count",
    (s, dir) => {
      Tables(s, dir).documents.select(
        col("doc_id"),
        tokenCount(col("text")).as("n_ws_tokens"),
        bpeIshTokenCount(col("text")).as("n_bpe_tokens"),
        length(col("text")).cast("long").as("n_chars_measured"))
    },
    Some("""SELECT doc_id,
              CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_ws_tokens,
              CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
              CAST(length(text) AS BIGINT) AS n_chars_measured
            FROM documents"""))

  /** Normalization fingerprint (sorted-distinct-token md5). */
  val qFingerprint = Q(
    "q_fingerprint",
    (s, dir) => {
      Tables(s, dir).documents.select(
        col("doc_id"),
        fingerprint(col("text")).as("fp"))
    },
    Some("""SELECT doc_id,
              md5(array_to_string(list_sort(list_distinct(
                string_split_regex(lower(trim(text)), '\s+'))), ' ')) AS fp
            FROM documents"""))

  /** Corpus-level statistics: vocabulary size, token volume, per-source
    * shape — the profiling pass before any training-data job. */
  val qCorpusStats = Q(
    "q_corpus_stats",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val toks = docs.select(col("source"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      toks.groupBy(col("source")).agg(
        countDistinct(col("tok")).as("vocab"),
        count(lit(1)).as("n_tokens"))
        .join(docs.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          round(avg(length(col("text"))), 4).as("avg_chars")), "source")
    },
    Some("""WITH toks AS (
              SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS tok
              FROM documents)
            SELECT t.source, t.vocab, t.n_tokens, d.n_docs, d.avg_chars
            FROM (SELECT source, count(DISTINCT tok) AS vocab, count(*) AS n_tokens
                  FROM toks GROUP BY source) t
            JOIN (SELECT source, count(*) AS n_docs,
                    round(avg(length(text)), 4) AS avg_chars
                  FROM documents GROUP BY source) d
            USING (source)"""))

  /** Information-theoretic corpus profile: per-source unigram entropy and
    * KL divergence from the whole-corpus distribution — the drift/mixture
    * diagnostics run before re-weighting a training mix. Token tables are
    * vocabulary-bounded (Heaps' law), so every aggregate after the
    * explode is small; the source↔corpus join keys on the token (uniform
    * — no broadcast assumption, AQE picks the strategy at real scale).
    * Both engines sum −p·ln p over identical count tables in 1e12
    * FIXED POINT: each term is rounded to a long before summation, so the
    * per-source sum is exact integer arithmetic — immune to partial-agg
    * merge order (the q_kmeans_step r5 flake class) and to last-ulp
    * engine-libm ln() disagreement at the final 4-decimal rounding. */
  val qEntropy = Q(
    "q_entropy",
    (s, dir) => {
      val toks = Tables(s, dir).documents
        .select(col("source"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
        .filter(length(col("tok")) > 0)
      val st = toks.groupBy(col("source"), col("tok"))
        .agg(count(lit(1)).as("n_st"))
      val sTot = st.groupBy(col("source")).agg(sum(col("n_st")).as("n_s"))
      val ct = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_ct"))
      val nTot = ct.agg(sum(col("n_ct")).as("n_c"))
      val joined = st
        .join(sTot, "source")
        .join(ct, "tok")
        .crossJoin(broadcast(nTot))
        .withColumn("p_s", col("n_st").cast("double") / col("n_s"))
        .withColumn("p_c", col("n_ct").cast("double") / col("n_c"))
      joined.groupBy(col("source"))
        .agg(
          max(col("n_s")).as("n_tokens"),
          // r4ratio (fl4 floor form), not round(): fixed-point sums make
          // exact .00005 boundaries reachable, where engine round()s
          // disagree
          graft.functions.TextFunctions.r4ratio(
            -(sum(round(col("p_s") * log(col("p_s")) * 1e12).cast("long")) / 1e12))
            .as("entropy"),
          graft.functions.TextFunctions.r4ratio(
            sum(round(col("p_s") * log(col("p_s") / col("p_c")) * 1e12).cast("long")) / 1e12)
            .as("kl_vs_corpus"))
    },
    Some("""WITH toks AS (
              SELECT source, tok
              FROM (SELECT source,
                      unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
                    FROM documents)
              WHERE length(tok) > 0),
            st AS (SELECT source, tok, count(*) AS n_st
                   FROM toks GROUP BY source, tok),
            stot AS (SELECT source, CAST(sum(n_st) AS BIGINT) AS n_s
                     FROM st GROUP BY source),
            ct AS (SELECT tok, count(*) AS n_ct FROM toks GROUP BY tok),
            ntot AS (SELECT sum(n_ct) AS n_c FROM ct)
            SELECT st.source, max(n_s) AS n_tokens,
              floor(-(CAST(sum(CAST(round((CAST(n_st AS DOUBLE) / n_s)
                         * ln(CAST(n_st AS DOUBLE) / n_s) * 1e12) AS BIGINT))
                      AS BIGINT) / 1e12) * 10000 + 0.5) / 10000 AS entropy,
              floor(CAST(sum(CAST(round((CAST(n_st AS DOUBLE) / n_s)
                        * ln((CAST(n_st AS DOUBLE) / n_s)
                           / (CAST(n_ct AS DOUBLE) / n_c)) * 1e12) AS BIGINT))
                    AS BIGINT) / 1e12 * 10000 + 0.5) / 10000 AS kl_vs_corpus
            FROM st
            JOIN stot USING (source)
            JOIN ct USING (tok)
            CROSS JOIN ntot
            GROUP BY st.source"""))

  /** PII scrubbing + normalization over synthetic contact strings (the
    * corpus itself is clean, so the query constructs realistic dirty text
    * from customer fields, then scrubs it). */
  val qPiiScrub = Q(
    "q_pii_scrub",
    (s, dir) => {
      val dirty = concat(
        lit("Contact "), col("c_name"), lit(" at "),
        lower(regexp_replace(col("c_name"), "[^A-Za-z0-9]", "")), lit("@example.com"),
        lit(" or 555-123-4567, account 1234567890123. "), upper(col("c_mktsegment")))
      Tables(s, dir).customer.select(
        col("c_custkey"),
        redactPii(dirty).as("clean"),
        normalizeText(dirty).as("normalized"))
    },
    Some("""SELECT c_custkey,
              regexp_replace(regexp_replace(regexp_replace(
                concat('Contact ', c_name, ' at ',
                  lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g')), '@example.com',
                  ' or 555-123-4567, account 1234567890123. ', upper(c_mktsegment)),
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                '\+?[0-9]{3}[- .][0-9]{3,4}[- .][0-9]{4}', '<PHONE>', 'g'),
                '[0-9]{9,}', '<ID>', 'g') AS clean,
              trim(regexp_replace(regexp_replace(lower(
                concat('Contact ', c_name, ' at ',
                  lower(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g')), '@example.com',
                  ' or 555-123-4567, account 1234567890123. ', upper(c_mktsegment))),
                '[\x00-\x1f]', ' ', 'g'), '\s+', ' ', 'g')) AS normalized
            FROM customer"""))

  /** Reproducible hash-bucket sampling + train/val split accounting.
    * Portable md5-hex-char arithmetic → the oracle computes the identical
    * buckets. */
  val qHashSample = Q(
    "q_hash_sample",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val (train, valSet) = graft.ops.Sampling.trainValSplit(docs, "doc_id", 32)
      train.select(lit("train").as("split"), col("doc_id"))
        .unionByName(valSet.select(lit("val").as("split"), col("doc_id")))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"))
    },
    Some("""SELECT CASE WHEN bucket < 32 THEN 'val' ELSE 'train' END AS split,
              count(*) AS n, min(doc_id) AS min_id
            FROM (
              SELECT doc_id,
                (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16
                + strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 2, 1)) - 1 AS bucket
              FROM documents)
            GROUP BY 1"""))

  /** Weighted sampling without replacement (Efraimidis–Spirakis
    * exponential keys over the stable md5 uniform): 50 documents drawn
    * ∝ n_chars. Selection order compares the UNROUNDED score on both
    * sides (doc_id tiebreak); only the emitted score is rounded. */
  val qWeightedSample = Q(
    "q_weighted_sample",
    (s, dir) => {
      graft.ops.Sampling
        .weightedSample(Tables(s, dir).documents, "doc_id", "n_chars", 50)
        .select(col("doc_id"), round(col("es_score") * 1000, 4).as("score_x1000"))
    },
    Some("""WITH s AS (
              SELECT doc_id,
                -ln((((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 1048576
                    + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 65536
                    + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 4096
                    + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 256
                    + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 16
                    + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1)
                    ) + 0.5) / 16777216.0) / n_chars AS es_score
              FROM (SELECT doc_id, n_chars, md5(doc_id::VARCHAR) AS h
                    FROM documents))
            SELECT doc_id, round(es_score * 1000, 4) AS score_x1000
            FROM s ORDER BY round(es_score * 1000, 4), doc_id LIMIT 50"""))

  /** Gopher-style repetition filters: duplicated-word fraction + most
    * repeated bigram, per doc — pure scan-stage array work on the Spark
    * side (sorted run-length scan, no explode/shuffle); the oracle derives
    * the same counts relationally (unnest + group + max). */
  val qRepetition = Q(
    "q_repetition",
    (s, dir) => {
      Tables(s, dir).documents
        .filter(col("doc_id") < 300)
        .select(col("doc_id") +: repetitionStats(col("text")): _*)
        .select(col("doc_id") +: repetitionMetrics(col("__rep")): _*)
    },
    Some("""WITH toks AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents WHERE doc_id < 300),
            base AS (
              SELECT doc_id, len(t) AS n_words,
                len(list_distinct(t)) AS n_distinct,
                list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                  i -> t[i] || ' ' || t[i + 1]) AS bg
              FROM toks),
            top AS (
              SELECT doc_id, max(cnt) AS top_bigram_n FROM (
                SELECT doc_id, g, count(*) AS cnt
                FROM (SELECT doc_id, unnest(bg) AS g FROM base)
                GROUP BY doc_id, g)
              GROUP BY doc_id)
            SELECT b.doc_id, b.n_words, b.n_distinct,
              floor((1 - b.n_distinct::DOUBLE / greatest(b.n_words, 1)) * 10000 + 0.5) / 10000
                AS dup_word_frac,
              coalesce(t.top_bigram_n, 0) AS top_bigram_n,
              floor(coalesce(t.top_bigram_n, 0)::DOUBLE
                / greatest(len(b.bg), 1) * 10000 + 0.5) / 10000 AS top_bigram_frac
            FROM base b LEFT JOIN top t USING (doc_id)"""))

  /** Sequence packing (contiguous fill): shard-parallel running token sum
    * → capacity bins. The oracle replicates the window arithmetic. */
  val qPack = Q(
    "q_pack",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
          tokenCount(col("text")).as("n_tokens"))
      graft.ops.Sampling.packBins(docs, "n_tokens", capacity = 512,
        shardCol = "shard", orderCol = "doc_id")
        .select(col("doc_id"), col("shard"), col("n_tokens"),
          col("cum_tokens"), col("bin"))
    },
    Some("""SELECT doc_id, doc_id % 8 AS shard, n_tokens,
              CAST(sum(n_tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id)
                AS BIGINT) AS cum_tokens,
              CAST(floor((sum(n_tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id)
                - n_tokens)::DOUBLE / 512) AS BIGINT) AS bin
            FROM (
              SELECT doc_id,
                CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
              FROM documents)"""))

  /** Stratified sampling: per-language keep rates over the skewed `lang`
    * column (downsample dominant en, keep all low-resource langs). The
    * oracle replicates the rate CASE and the portable md5-hex bucket. */
  val qStratifiedSample = Q(
    "q_stratified_sample",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      graft.ops.Sampling.stratifiedSample(docs, "doc_id", "lang",
          rates = Map("en" -> 32, "fr" -> 256, "zh" -> 256), defaultRate = 64)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"))
    },
    Some("""SELECT lang, count(*) AS n, min(doc_id) AS min_id
            FROM (
              SELECT doc_id, lang,
                (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16
                + strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 2, 1)) - 1 AS bucket,
                CASE lang WHEN 'en' THEN 32 WHEN 'fr' THEN 256 WHEN 'zh' THEN 256
                          ELSE 64 END AS rate
              FROM documents)
            WHERE bucket < rate
            GROUP BY 1"""))

  /** Deterministic shard shuffle: shard + within-shard position as pure
    * functions of (seed, doc_id); the oracle recomputes the identical
    * permutation, proving engine-portability of the epoch ordering. */
  val qShardShuffle = Q(
    "q_shard_shuffle",
    (s, dir) => {
      val docs = Tables(s, dir).documents.select(col("doc_id"))
      graft.ops.Sampling.shardShuffle(docs, "doc_id", seed = "epoch0", numShards = 8)
        .select(col("doc_id"), col("shard").cast("long").as("shard"), col("pos"))
    },
    Some("""SELECT doc_id, shard, CAST(row_number() OVER
              (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
            FROM (
              SELECT doc_id, md5('epoch0:' || doc_id::VARCHAR) AS h,
                CAST(((strpos('0123456789abcdef', substr(md5('epoch0:' || doc_id::VARCHAR), 1, 1)) - 1) * 16
                 + strpos('0123456789abcdef', substr(md5('epoch0:' || doc_id::VARCHAR), 2, 1)) - 1) % 8
                  AS BIGINT) AS shard
              FROM documents)"""))

  /** BM25 keyword search: top-10 docs for a 3-term query. The oracle
    * replicates tokenization, document frequencies, corpus constants and
    * the Okapi formula relationally. Ordered by the quantized score (ties
    * broken by doc_id) so last-ulp summation differences between engines
    * cannot reorder the boundary. */
  val qBm25 = Q(
    "q_bm25",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      graft.sim.Bm25.scores(docs, "doc_id", "text",
          query = Seq("hash", "join", "vector"))
        .select(col("id").as("doc_id"),
          (floor(col("score") * 10000 + 0.5) / 10000).as("score"),
          col("n_terms"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(10)
    },
    Some("""WITH base AS (
              SELECT doc_id,
                list_filter(string_split_regex(lower(trim(text)), '\s+'),
                            t -> len(t) > 0) AS toks
              FROM documents),
            dl AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM base),
            stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
            post AS (
              SELECT doc_id, term, count(*)::BIGINT AS tf
              FROM (SELECT doc_id, unnest(toks) AS term FROM base)
              WHERE term IN ('hash', 'join', 'vector')
              GROUP BY 1, 2),
            dfreq AS (SELECT term, count(*)::BIGINT AS df FROM post GROUP BY 1),
            scored AS (
              SELECT p.doc_id,
                sum(ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
                    * (p.tf * 2.2)
                    / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))) AS score,
                count(*) AS n_terms
              FROM post p
              JOIN dfreq f USING (term)
              JOIN dl USING (doc_id)
              CROSS JOIN stats s
              GROUP BY 1)
            SELECT doc_id, floor(score * 10000 + 0.5) / 10000 AS score, n_terms
            FROM scored
            ORDER BY 2 DESC, doc_id
            LIMIT 10"""))

  /** Reciprocal-rank fusion (Cormack et al. 2009) of two retrieval
    * rankings — the standard hybrid-search combiner (lexical × prior
    * here; same algebra fuses BM25 × ANN). Each ranker is first cut to
    * its own top-N via sort+limit (TakeOrderedAndProject — never a
    * global row_number over the corpus); ranks are then assigned INSIDE
    * the N-row shortlists, fused over a full outer join, missing lists
    * contributing zero. */
  val qRrfFusion = Q(
    "q_rrf_fusion",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir).documents
      val topN = 50
      val lex = graft.sim.Bm25.scores(docs, "doc_id", "text",
          query = Seq("hash", "join", "vector"))
        // quantize BEFORE the cut and the ranks (q_bm25's fl4 convention):
        // ordering on the raw float sum would let cross-engine ulps flip
        // a rank at the shortlist boundary
        .select(col("id").as("doc_id"),
          (floor(col("score") * 10000 + 0.5) / 10000).as("score"))
        .orderBy(col("score").desc, col("doc_id")).limit(topN)
        .withColumn("rank_lex", row_number().over( // ≤ topN rows by the limit
          graft.ops.BoundedWindow.orderBy(col("score").desc, col("doc_id"))))
        .select(col("doc_id"), col("rank_lex"))
      val prior = docs
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("n_chars").desc, col("doc_id")).limit(topN)
        .withColumn("rank_prior", row_number().over( // ≤ topN rows by the limit
          graft.ops.BoundedWindow.orderBy(col("n_chars").desc, col("doc_id"))))
        .select(col("doc_id").as("p_doc_id"), col("rank_prior"))
      lex.join(prior, col("doc_id") === col("p_doc_id"), "full_outer")
        .select(
          coalesce(col("doc_id"), col("p_doc_id")).as("doc_id"),
          round((coalesce(lit(1.0) / (lit(60) + col("rank_lex")), lit(0.0))
               + coalesce(lit(1.0) / (lit(60) + col("rank_prior")), lit(0.0)))
            * 1000, 4).as("rrf_x1000"))
        .orderBy(col("rrf_x1000").desc, col("doc_id"))
        .limit(15)
    },
    Some("""WITH base AS (
              SELECT doc_id,
                list_filter(string_split_regex(lower(trim(text)), '\s+'),
                            t -> len(t) > 0) AS toks
              FROM documents),
            dl AS (SELECT doc_id, len(toks)::BIGINT AS dl FROM base),
            stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
            post AS (
              SELECT doc_id, term, count(*)::BIGINT AS tf
              FROM (SELECT doc_id, unnest(toks) AS term FROM base)
              WHERE term IN ('hash', 'join', 'vector')
              GROUP BY 1, 2),
            dfreq AS (SELECT term, count(*)::BIGINT AS df FROM post GROUP BY 1),
            scored AS (
              SELECT p.doc_id,
                sum(ln((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
                    * (p.tf * 2.2)
                    / (p.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))) AS score
              FROM post p
              JOIN dfreq f USING (term)
              JOIN dl USING (doc_id)
              CROSS JOIN stats s
              GROUP BY 1),
            lex AS (
              SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank_lex
              FROM (SELECT doc_id, floor(score * 10000 + 0.5) / 10000 AS score
                    FROM scored)
              ORDER BY score DESC, doc_id LIMIT 50),
            prior AS (
              SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank_prior
              FROM documents ORDER BY n_chars DESC, doc_id LIMIT 50)
            SELECT coalesce(l.doc_id, p.doc_id) AS doc_id,
              round((coalesce(CAST(1.0 AS DOUBLE) / (60 + l.rank_lex), 0.0)
                   + coalesce(CAST(1.0 AS DOUBLE) / (60 + p.rank_prior), 0.0))
                * 1000, 4) AS rrf_x1000
            FROM lex l FULL OUTER JOIN prior p ON l.doc_id = p.doc_id
            ORDER BY rrf_x1000 DESC, doc_id LIMIT 15"""))

  /** Domain-level quality gate (RefinedWeb-style): documents survive iff
    * their whole SOURCE clears a mean-quality floor and a minimum volume —
    * the "bad neighborhood" curation step no per-row filter expresses.
    * Corpus is never shuffled: per-source verdicts are a tiny partial agg
    * broadcast back. */
  val qDomainGate = Q(
    "q_domain_gate",
    (s, dir) => {
      graft.ops.Curation.sourceQualityGate(
        Tables(s, dir).documents,
        "source",
        floor(qualityScore(col("text")) * 10000 + 0.5) / 10000,
        minMean = 0.44,
        minDocs = 10)
        .select(col("doc_id"), col("source"), col("doc_quality"),
          col("src_mean_quality"), col("src_docs"))
    },
    Some {
      val stop = defaultStopwords.map { w =>
        s"CAST((length(p) - length(replace(p, ' $w ', ''))) / ${w.length + 2} AS BIGINT)"
      }.mkString(" + ")
      s"""WITH scored AS (
            SELECT doc_id, source, floor(
              least(greatest(
                least(length(text) / 500.0, 1.0) * 0.5
                + least((($stop) / greatest(ntok, 1.0)) * 5.0, 1.0) * 0.5
                - (npunct / greatest(length(text)::DOUBLE, 1.0)) * 2.0,
              0.0), 1.0) * 10000 + 0.5) / 10000 AS doc_quality
            FROM (
              SELECT doc_id, source, text, ' ' || text || ' ' AS p,
                CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+')) END::DOUBLE AS ntok,
                len(regexp_extract_all(text, '[.,;:!?''"()\\[\\]{}-]'))::DOUBLE AS npunct
              FROM documents)),
          verdicts AS (
            SELECT source,
              floor(avg(doc_quality) * 10000 + 0.5) / 10000 AS src_mean_quality,
              count(*) AS src_docs
            FROM scored GROUP BY source
            HAVING src_mean_quality >= 0.44 AND src_docs >= 10)
          SELECT s.doc_id, s.source, s.doc_quality, v.src_mean_quality, v.src_docs
          FROM scored s JOIN verdicts v USING (source)"""
    })

  /** BPE pair statistics: top-50 adjacent character pairs weighted by word
    * frequency — one distributed merge-selection round of tokenizer
    * training. Deterministic tiebreak on the pair string. */
  val qBpePairs = Q(
    "q_bpe_pairs",
    (s, dir) => {
      bpePairStats(Tables(s, dir).documents, "text", k = 50)
    },
    Some("""WITH words AS (
              SELECT w, count(*) AS wc FROM (
                SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
                FROM documents)
              WHERE length(w) > 1 GROUP BY w),
            pairs AS (
              SELECT substring(w, CAST(i AS INTEGER), 2) AS pair, wc
              FROM words, unnest(range(1, length(w))) AS t(i))
            SELECT pair, CAST(sum(wc) AS BIGINT) AS n_occurrences
            FROM pairs GROUP BY pair
            ORDER BY n_occurrences DESC, pair
            LIMIT 50"""))

  /** Gopher structural rule battery (Rae et al. 2021): word count, mean
    * word length, symbol ratio, alpha-word fraction, stopword hits and
    * the composite verdict — one scan-stage projection per doc; the
    * oracle recomputes every rule relationally. */
  val qGopherRules = Q(
    "q_gopher_rules",
    (s, dir) => {
      Tables(s, dir).documents
        .select(col("doc_id") +: gopherStats(col("text"), minWords = 20): _*)
    },
    Some {
      val stop = defaultStopwords.map { w =>
        s"CAST((length(p) - length(replace(p, ' $w ', ''))) / ${w.length + 2} AS BIGINT)"
      }.mkString(" + ")
      s"""WITH base AS (
            SELECT doc_id, text, ' ' || text || ' ' AS p,
              CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS ntok,
              length(regexp_replace(text, '\\s', '', 'g')) AS nonspace,
              CAST((length(text) - length(replace(text, '#', ''))) / 1 AS BIGINT)
                + CAST((length(text) - length(replace(text, '...', ''))) / 3 AS BIGINT) AS symbols,
              CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                   w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS alpha_words
            FROM documents),
          stats AS (
            SELECT doc_id, ntok AS n_words,
              floor(nonspace / greatest(ntok, 1)::DOUBLE * 10000 + 0.5) / 10000 AS mean_word_len,
              floor(symbols / greatest(ntok, 1)::DOUBLE * 10000 + 0.5) / 10000 AS symbol_ratio,
              floor(alpha_words / greatest(ntok, 1)::DOUBLE * 10000 + 0.5) / 10000 AS alpha_frac,
              CAST($stop AS BIGINT) AS stop_hits
            FROM base)
          SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac, stop_hits,
            CAST(n_words >= 20 AND n_words <= 100000
              AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
              AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
              AND stop_hits >= 2 AS BIGINT) AS gopher_pass
          FROM stats"""
    })

  /** Sliding-window chunking with overlap (window 32, stride 24): every
    * token covered, deterministic chunk ids, scan-stage explode — the
    * oracle rebuilds the identical windows via generate_series + list
    * slicing. */
  val qChunk = Q(
    "q_chunk",
    (s, dir) => {
      graft.ops.Chunking.slidingChunks(
        Tables(s, dir).documents.filter(col("doc_id") < 200),
        "doc_id", "text", window = 32, stride = 24)
    },
    Some("""WITH d AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents WHERE doc_id < 200 AND length(trim(text)) > 0),
            sized AS (SELECT doc_id, t, len(t) AS n FROM d),
            starts AS (
              SELECT doc_id, t, unnest(generate_series(0,
                CASE WHEN n <= 32 THEN 0 ELSE ((n - 32 + 23) // 24) * 24 END,
                24)) AS s
              FROM sized)
            SELECT doc_id, CAST(s // 24 AS BIGINT) AS chunk_id,
              array_to_string(list_slice(t, s + 1, s + 32), ' ') AS chunk_text,
              CAST(len(list_slice(t, s + 1, s + 32)) AS BIGINT) AS n_chunk_tokens
            FROM starts"""))

  /** Temperature-scaled language rebalance (alpha = 0.5): keep rates are
    * a pure function of per-stratum counts, corpus never shuffled; the
    * oracle recomputes counts, rates and the hash filter end-to-end. */
  val qTemperatureMix = Q(
    "q_temperature_mix",
    (s, dir) => {
      graft.ops.Sampling.temperatureMix(
        Tables(s, dir).documents, "doc_id", "lang", alpha = 0.5)
        .groupBy(col("lang"), col("n_s"), col("rate"))
        .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("min_id"))
        .select(col("lang"), col("n_s"), col("rate").cast("long").as("rate"),
          col("n_kept"), col("min_id"))
    },
    Some("""WITH c AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY lang),
            m AS (SELECT min(n_s) AS n_min FROM c),
            r AS (SELECT lang, n_s,
                least(256, greatest(1,
                  CAST(floor(power(n_s::DOUBLE / n_min, -0.5) * 256 + 0.5) AS INTEGER))) AS rate
              FROM c, m),
            k AS (SELECT d.lang, d.doc_id, r.n_s, r.rate
              FROM documents d JOIN r USING (lang)
              WHERE (strpos('0123456789abcdef', substr(md5(d.doc_id::VARCHAR), 1, 1)) - 1) * 16
                  + strpos('0123456789abcdef', substr(md5(d.doc_id::VARCHAR), 2, 1)) - 1 < rate)
            SELECT lang, n_s, CAST(rate AS BIGINT) AS rate,
              count(*) AS n_kept, min(doc_id) AS min_id
            FROM k GROUP BY lang, n_s, rate"""))

  /** Fractional-epoch mixture upsampling: src0 upsampled 2.5×, src1
    * downsampled to a quarter, everything else one epoch. The output is
    * the replicated row set itself (doc_id, source, epoch_copy) — the
    * oracle replays floor+hash-remainder replication with
    * generate_series, so copy counts AND replica indexes hash-match. */
  val qEpochMix = Q(
    "q_epoch_mix",
    (s, dir) => {
      graft.ops.Sampling.epochUpsample(
          Tables(s, dir).documents.select(col("doc_id"), col("source")),
          "doc_id", "source", Map("src0" -> 2.5, "src1" -> 0.25))
        .select(col("doc_id"), col("source"),
          col("epoch_copy").cast("long").as("epoch_copy"))
    },
    Some("""WITH e AS (
              SELECT doc_id, source,
                CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0 ELSE 1 END
                  + CASE WHEN (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16
                       + strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 2, 1)) - 1
                       < CASE source WHEN 'src0' THEN 128 WHEN 'src1' THEN 64 ELSE 0 END
                    THEN 1 ELSE 0 END AS copies
              FROM documents)
            SELECT doc_id, source,
              CAST(unnest(generate_series(1, copies)) AS BIGINT) AS epoch_copy
            FROM e"""))

  /** Mixture application (the DoReMi loop's second half): resample the
    * corpus to a target per-domain α vector — data-derived rates, the
    * epoch-mix md5-remainder convention for fractional copies, exact
    * replication for r ≥ 1. The oracle recomputes counts, rates,
    * thresholds and the copy explosion relationally. */
  val qMixtureApply = Q(
    "q_mixture_apply",
    (s, dir) => {
      val alpha = when(col("source") === "src0", 0.2)
        .when(col("source") === "src1", 0.05)
        .otherwise(lit(0.75 / 18))
      graft.ops.Sampling.applyMixture(
          Tables(s, dir).documents.select(col("doc_id"), col("source")),
          "doc_id", "source", alpha)
        .select(col("doc_id"), col("source"),
          col("mix_copy").cast("long").as("mix_copy"))
    },
    Some("""WITH d AS (SELECT doc_id, source FROM documents),
            nd AS (SELECT source, count(*) AS n_d FROM d GROUP BY source),
            t AS (SELECT count(*) AS n FROM d),
            r AS (
              SELECT doc_id, d.source,
                (CASE d.source WHEN 'src0' THEN 0.2 WHEN 'src1' THEN 0.05
                  ELSE 0.75 / 18 END)
                  * n::DOUBLE / n_d::DOUBLE AS rr
              FROM d JOIN nd ON d.source = nd.source, t),
            c AS (
              SELECT doc_id, source,
                CAST(floor(rr) AS INT) + CASE WHEN
                  (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16
                    + strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 2, 1)) - 1
                  < floor((rr - floor(rr)) * 256 + 0.5) THEN 1 ELSE 0 END AS copies
              FROM r)
            SELECT doc_id, source,
              CAST(unnest(generate_series(1, copies)) AS BIGINT) AS mix_copy
            FROM c WHERE copies >= 1"""))

  /** C4 line-rule battery (Raffel et al. 2020 §2.2) over fabricated
    * 3-word lines (the short tail line is KEPT here, so the min-words rule
    * has something to drop, unlike q_line_dedup's exact-3 filter). Line
    * ban on a corpus word exercises the substring rule; the page gate
    * requires 5 surviving lines. Pure scan-stage array math — no shuffle
    * (asserted in ScalePathSpec). */
  val qC4Filter = Q(
    "q_c4_filter",
    (s, dir) => {
      // array(…)/flatten let-binding: split once per doc, not per line
      // (the outer-column-in-lambda O(len²) trap — r17, via q_boilerplate)
      val lines = flatten(transform(
        array(split(trim(col("text")), "\\s+")), ts =>
          transform(
            sequence(lit(0), floor((size(ts) - lit(1)) / lit(3)).cast("int")),
            i => concat_ws(" ", slice(ts, i * 3 + 1, lit(3))))))
      val d = Tables(s, dir).documents.select(col("doc_id"), lines.as("lines"))
      graft.ops.Curation.c4LineFilter(d, "doc_id", col("lines"),
          minWords = 3, minLines = 5,
          lineBanned = Seq("slow"), pageBanned = Seq("lorem ipsum"))
        .select(col("doc_id"), col("clean_text"),
          col("n_kept").cast("long").as("n_kept"),
          col("n_dropped").cast("long").as("n_dropped"),
          col("page_keep"))
    },
    Some("""WITH toks AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents),
            lines AS (
              SELECT doc_id, list_transform(range(1, len(t) + 1, 3),
                       i -> array_to_string(list_slice(t, i, i + 2), ' ')) AS ls
              FROM toks),
            f AS (
              SELECT doc_id,
                list_filter(ls, l -> len(list_filter(string_split_regex(l, '\s+'),
                                           w -> length(w) > 0)) >= 3
                                 AND NOT contains(l, 'slow')) AS kept,
                len(ls) AS n,
                len(list_filter(ls, l -> contains(l, 'lorem ipsum'))) > 0 AS ban
              FROM lines)
            SELECT doc_id,
              array_to_string(kept, chr(10)) AS clean_text,
              CAST(len(kept) AS BIGINT) AS n_kept,
              CAST(n - len(kept) AS BIGINT) AS n_dropped,
              (len(kept) >= 5 AND NOT ban) AS page_keep
            FROM f"""))

  /** DSIR importance weights (unigram feature space, target = English
    * docs): vocabulary-sized smoothed log-ratio table broadcast onto the
    * token stream; the oracle recomputes both language models and every
    * per-doc sum relationally. */
  val qDsirWeights = Q(
    "q_dsir_weights",
    (s, dir) => {
      graft.ops.Curation.dsirWeights(
        Tables(s, dir).documents, "doc_id", "text", col("lang") === "en")
    },
    Some("""WITH toks AS (
              SELECT doc_id, lang = 'en' AS t,
                unnest(string_split_regex(trim(text), '\s+')) AS w
              FROM documents),
            wc AS (
              SELECT w,
                CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
                CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT) AS c_r
              FROM toks GROUP BY w),
            consts AS (
              SELECT CAST(sum(c_t) AS BIGINT) AS n_t,
                     CAST(sum(c_r) AS BIGINT) AS n_r,
                     count(*) AS v
              FROM wc),
            ratios AS (
              SELECT w,
                ln((c_t + 1)::DOUBLE / (n_t + v)::DOUBLE)
                  - ln((c_r + 1)::DOUBLE / (n_r + v)::DOUBLE) AS lr
              FROM wc, consts)
            SELECT doc_id, count(*) AS n_toks,
              floor(sum(lr) * 10000 + 0.5) / 10000 AS dsir_weight
            FROM toks JOIN ratios USING (w)
            GROUP BY doc_id"""))

  /** Greedy longest-match segmentation vocabulary for q_greedy_pieces:
    * full corpus words plus letter fallbacks (letters missing here fall
    * through to `<unk>`). */
  private val pieceVocab: Seq[String] = Seq(
    "the", "spark", "scan", "sort", "join", "stream", "batch", "window",
    "query", "data", "table", "filter", "value", "group", "line", "customer",
    "merge", "hash", "agg", "row", "key", "fast", "slow", "small", "big",
    "column", "order", "part", "vector", "dup",
    "s", "c", "a", "t", "e", "r", "o", "w", "m")

  /** Tokenizer APPLY (greedy longest-match subword segmentation): the
    * native expression segments whole documents in the scan stage (zero
    * shuffle); the oracle independently segments the DISTINCT-word table
    * with a recursive CTE and reassembles per doc — two formulations of
    * the same greedy rule checking each other. */
  val qGreedyPieces = Q(
    "q_greedy_pieces",
    (s, dir) => {
      Tables(s, dir).documents.filter(col("doc_id") < 200)
        .select(col("doc_id"),
          graft.plans.TextNative.greedyPieces(col("text"), pieceVocab).as("__p"))
        .select(col("doc_id"),
          array_join(col("__p"), "|").as("pieces_str"),
          size(col("__p")).cast("long").as("n_pieces"),
          size(filter(col("__p"), p => p === "<unk>")).cast("long").as("n_unk"))
    },
    Some {
      val vals = pieceVocab.map(t => s"('$t')").mkString(", ")
      s"""WITH RECURSIVE
            vocab(tok) AS (VALUES $vals),
            d AS (SELECT doc_id, trim(text) AS tx FROM documents WHERE doc_id < 200),
            toks AS (SELECT doc_id,
                unnest(string_split_regex(tx, '\\s+')) AS w,
                unnest(range(len(string_split_regex(tx, '\\s+')))) AS wpos
              FROM d),
            words AS (SELECT DISTINCT w FROM toks),
            seg AS (
              SELECT w, 0 AS pos, CAST([] AS VARCHAR[]) AS pieces FROM words
              UNION ALL
              SELECT seg.w, seg.pos + coalesce(length(b.tok), 1),
                     list_append(seg.pieces, coalesce(b.tok, '<unk>'))
              FROM seg LEFT JOIN LATERAL (
                SELECT tok FROM vocab
                WHERE substr(seg.w, seg.pos + 1, length(tok)) = tok
                ORDER BY length(tok) DESC LIMIT 1) b ON true
              WHERE seg.pos < length(seg.w)),
            done AS (SELECT w, pieces FROM seg
                     WHERE pos >= length(w) AND length(w) > 0),
            perword AS (SELECT doc_id, wpos, pieces FROM toks JOIN done USING (w))
          SELECT doc_id,
            string_agg(array_to_string(pieces, '|'), '|' ORDER BY wpos) AS pieces_str,
            CAST(sum(len(pieces)) AS BIGINT) AS n_pieces,
            CAST(sum(len(list_filter(pieces, p -> p = '<unk>'))) AS BIGINT) AS n_unk
          FROM perword GROUP BY doc_id"""
    })

  /** CCNet-style bigram perplexity: vocabulary-bounded count tables
    * broadcast onto the bigram stream; the oracle re-estimates the same
    * smoothed LM and every per-doc perplexity relationally. */
  val qPerplexity = Q(
    "q_perplexity",
    (s, dir) => {
      graft.ops.Curation.bigramPerplexity(
        Tables(s, dir).documents, "doc_id", "text")
    },
    Some("""WITH toks AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
            bigrams AS (
              SELECT doc_id,
                t[s + 1] AS w1, t[s + 2] AS w2
              FROM (SELECT doc_id, t, unnest(range(0, len(t) - 1)) AS s
                    FROM toks WHERE len(t) >= 2)),
            bc AS (SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY w1, w2),
            hc AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bc GROUP BY w1),
            vs AS (SELECT count(DISTINCT w) AS v FROM (
                     SELECT unnest(t) AS w FROM toks)),
            probs AS (
              SELECT bc.w1, bc.w2,
                ln((c12 + 1)::DOUBLE / (c1 + v)::DOUBLE) AS lp
              FROM bc JOIN hc USING (w1), vs)
            SELECT doc_id, count(*) AS n_bigrams,
              floor(exp(-sum(lp) / count(*)) * 10000 + 0.5) / 10000 AS ppl
            FROM bigrams JOIN probs USING (w1, w2)
            GROUP BY doc_id"""))

  /** CCNet head/middle/tail perplexity buckets (Wenzek et al. 2020 §4.3
    * — the actual corpus-selection step their LM perplexity feeds):
    * per-language perplexity TERCILES split documents into head (best
    * third), middle, tail. Composes [[graft.ops.Curation
    * .bigramPerplexity]] with the exact-percentile cut pattern of
    * q_percentiles; thresholds compare on the fl4-floored ppl both
    * sides, so bucket boundaries cannot drift between engines. Scale:
    * the cut table is |languages| rows broadcast back; the corpus joins
    * it on lang — nothing new shuffles beyond the perplexity op. */
  val qCcnetBuckets = Q(
    "q_ccnet_buckets",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val ppl = graft.ops.Curation.bigramPerplexity(docs, "doc_id", "text")
      val wl = ppl.join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .localCheckpoint(true) // feeds the cut table AND the bucket join
      val cuts = wl.groupBy(col("lang")).agg(
        expr("percentile(ppl, 1.0D/3.0D)").as("p33"),
        expr("percentile(ppl, 2.0D/3.0D)").as("p66"))
      wl.join(broadcast(cuts), "lang")
        .select(col("doc_id"), col("lang"), col("ppl"),
          when(col("ppl") <= col("p33"), "head")
            .when(col("ppl") <= col("p66"), "middle")
            .otherwise("tail").as("bucket"))
    },
    Some("""WITH toks AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
            bigrams AS (
              SELECT doc_id,
                t[s + 1] AS w1, t[s + 2] AS w2
              FROM (SELECT doc_id, t, unnest(range(0, len(t) - 1)) AS s
                    FROM toks WHERE len(t) >= 2)),
            bc AS (SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY w1, w2),
            hc AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bc GROUP BY w1),
            vs AS (SELECT count(DISTINCT w) AS v FROM (
                     SELECT unnest(t) AS w FROM toks)),
            probs AS (
              SELECT bc.w1, bc.w2,
                ln((c12 + 1)::DOUBLE / (c1 + v)::DOUBLE) AS lp
              FROM bc JOIN hc USING (w1), vs),
            ppl AS (
              SELECT doc_id,
                floor(exp(-sum(lp) / count(*)) * 10000 + 0.5) / 10000 AS ppl
              FROM bigrams JOIN probs USING (w1, w2)
              GROUP BY doc_id),
            wl AS (SELECT p.doc_id, d.lang, p.ppl
                   FROM ppl p JOIN documents d USING (doc_id)),
            cuts AS (SELECT lang,
                       quantile_cont(ppl, 1.0/3.0) AS p33,
                       quantile_cont(ppl, 2.0/3.0) AS p66
                     FROM wl GROUP BY lang)
            SELECT doc_id, lang, ppl,
              CASE WHEN ppl <= p33 THEN 'head'
                   WHEN ppl <= p66 THEN 'middle'
                   ELSE 'tail' END AS bucket
            FROM wl JOIN cuts USING (lang)"""))

  /** TF-IDF keyterm extraction: top-3 terms per document (smoothed idf,
    * lexicographic tie-break → total order). The oracle recomputes tf,
    * df and the windowed top-k relationally. */
  val qTfidf = Q(
    "q_tfidf",
    (s, dir) => {
      graft.functions.TermStats.tfidfTopTerms(
        Tables(s, dir).documents.filter(col("doc_id") < 100),
        "doc_id", "text", k = 3)
    },
    Some("""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
            toks AS (SELECT doc_id,
                unnest(string_split_regex(trim(text), '\s+')) AS term
              FROM d),
            tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM toks WHERE length(term) > 0 GROUP BY doc_id, term),
            dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM d),
            scored AS (
              SELECT doc_id, term, tf,
                tf * ln((n_docs + 1)::DOUBLE / (df + 1)::DOUBLE) AS score,
                row_number() OVER (PARTITION BY doc_id
                  ORDER BY tf * ln((n_docs + 1)::DOUBLE / (df + 1)::DOUBLE) DESC,
                           term) AS rank
              FROM tf JOIN dfreq USING (term), n)
            SELECT doc_id, term, tf, CAST(rank AS BIGINT) AS rank,
              floor(score * 10000 + 0.5) / 10000 AS score
            FROM scored WHERE rank <= 3"""))

  /** PMI collocations over adjacent word pairs (min count 5): the
    * oracle re-derives the pair table, both marginals and the total. */
  /** χ² distinctive terms per `source` (Yang & Pedersen 1997 feature
    * selection): top-5 positively-associated terms per class with
    * df ≥ 5. Exact-integer contingency; the one double expression is
    * association-mirrored in the oracle (see
    * [[graft.functions.TermStats.chi2Terms]]). */
  val qChi2Terms = Q(
    "q_chi2_terms",
    (s, dir) => {
      graft.functions.TermStats.chi2Terms(
        Tables(s, dir).documents, "doc_id", "source", "text",
        k = 5, minDf = 5L)
    },
    Some("""WITH d AS (
              SELECT source AS cls,
                list_distinct(list_filter(
                  string_split_regex(trim(text), '\s+'),
                  w -> length(w) > 0)) AS toks
              FROM documents),
            ex AS (SELECT cls, unnest(toks) AS term FROM d),
            aa AS (SELECT cls, term, count(*) AS a FROM ex GROUP BY cls, term),
            dfreq AS (SELECT term, CAST(sum(a) AS BIGINT) AS df
                      FROM aa GROUP BY term),
            cs AS (SELECT source AS cls, count(*) AS n_cls
                   FROM documents GROUP BY source),
            n AS (SELECT count(*) AS n_docs FROM documents),
            scored AS (
              SELECT cls, term, a,
                df - a AS b, n_cls - a AS c, n_docs - n_cls - (df - a) AS d,
                CAST(a * (n_docs - n_cls - (df - a))
                     - (df - a) * (n_cls - a) AS DOUBLE) AS diff,
                n_docs, n_cls, df
              FROM aa JOIN dfreq USING (term) JOIN cs USING (cls), n
              WHERE df >= 5 AND a * (n_docs - n_cls) > (df - a) * n_cls),
            ranked AS (
              SELECT cls, term, a AS df_class,
                CAST(n_docs AS DOUBLE) * diff * diff /
                  (CAST((a + b) * (c + d) AS DOUBLE)
                    * CAST((a + c) * (b + d) AS DOUBLE)) AS chi2
              FROM scored)
            SELECT cls, term, df_class, CAST(rank AS BIGINT) AS rank,
              floor(chi2 * 10000 + 0.5) / 10000 AS chi2
            FROM (SELECT cls, term, df_class, chi2,
                    row_number() OVER (PARTITION BY cls
                      ORDER BY chi2 DESC, term) AS rank
                  FROM ranked)
            WHERE rank <= 5"""))

  /** Hashing-trick featurization into 16 signed BIGINT lanes via the
    * portable md5 convention — any engine reproduces the exact vector;
    * see [[graft.functions.TermStats.hashFeatures]]. */
  val qFeatureHash = Q(
    "q_feature_hash",
    (s, dir) => {
      graft.functions.TermStats.hashFeatures(
        Tables(s, dir).documents.filter(col("doc_id") % 3 === 0),
        "doc_id", "text")
    },
    Some("""WITH toks AS (
              SELECT doc_id,
                unnest(string_split_regex(trim(text), '\s+')) AS term
              FROM documents WHERE doc_id % 3 = 0),
            h AS (
              SELECT doc_id,
                ('0x' || substring(md5(term), 1, 1))::BIGINT AS b,
                CASE WHEN ('0x' || substring(md5(term), 2, 1))::BIGINT % 2 = 0
                     THEN 1 ELSE -1 END AS sg
              FROM toks WHERE length(term) > 0)
            SELECT doc_id,
              CAST(coalesce(sum(sg) FILTER (WHERE b = 0), 0) AS BIGINT) AS f0,
              CAST(coalesce(sum(sg) FILTER (WHERE b = 1), 0) AS BIGINT) AS f1,
              CAST(coalesce(sum(sg) FILTER (WHERE b = 2), 0) AS BIGINT) AS f2,
              CAST(coalesce(sum(sg) FILTER (WHERE b = 3), 0) AS BIGINT) AS f3,
              CAST(coalesce(sum(sg) FILTER (WHERE b = 4), 0) AS BIGINT) AS f4,
              CAST(coalesce(sum(sg) FILTER (WHERE b = 5), 0) AS BIGINT) AS f5,
              CAST(coalesce(sum(sg) FILTER (WHERE b = 6), 0) AS BIGINT) AS f6,
              CAST(coalesce(sum(sg) FILTER (WHERE b = 7), 0) AS BIGINT) AS f7,
              CAST(coalesce(sum(sg) FILTER (WHERE b = 8), 0) AS BIGINT) AS f8,
              CAST(coalesce(sum(sg) FILTER (WHERE b = 9), 0) AS BIGINT) AS f9,
              CAST(coalesce(sum(sg) FILTER (WHERE b = 10), 0) AS BIGINT) AS f10,
              CAST(coalesce(sum(sg) FILTER (WHERE b = 11), 0) AS BIGINT) AS f11,
              CAST(coalesce(sum(sg) FILTER (WHERE b = 12), 0) AS BIGINT) AS f12,
              CAST(coalesce(sum(sg) FILTER (WHERE b = 13), 0) AS BIGINT) AS f13,
              CAST(coalesce(sum(sg) FILTER (WHERE b = 14), 0) AS BIGINT) AS f14,
              CAST(coalesce(sum(sg) FILTER (WHERE b = 15), 0) AS BIGINT) AS f15
            FROM h GROUP BY doc_id"""))

  val qPmi = Q(
    "q_pmi",
    (s, dir) => {
      graft.functions.TermStats.pmiCollocations(
        Tables(s, dir).documents, "text", minCount = 5L)
    },
    Some("""WITH toks AS (
              SELECT list_filter(string_split_regex(trim(text), '\s+'),
                       w -> length(w) > 0) AS t
              FROM documents),
            pairs AS (
              SELECT t[s + 1] AS w1, t[s + 2] AS w2
              FROM (SELECT t, unnest(range(0, len(t) - 1)) AS s
                    FROM toks WHERE len(t) >= 2)),
            bc AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
            c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM bc GROUP BY w1),
            c2 AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM bc GROUP BY w2),
            n AS (SELECT CAST(sum(c12) AS BIGINT) AS n_pairs FROM bc)
            SELECT w1, w2, c12,
              floor(ln(c12::DOUBLE * n_pairs / (c1 * c2)) * 10000 + 0.5) / 10000
                AS pmi
            FROM bc JOIN c1 USING (w1) JOIN c2 USING (w2), n
            WHERE c12 >= 5"""))

  /** Unicode NFC normalization ([[graft.plans.NfcNormalize]] — JDK
    * `java.text.Normalizer`, the dedup-correctness primitive before any
    * hash lane: precomposed U+00E9 and decomposed e+U+0301 must hash
    * identically). Per-doc text is suffixed with a parity-chosen
    * precomposed OR decomposed marker; the expression must collapse
    * both to one NFC form — md5 of the normalized text is
    * parity-invariant and the oracle replays it with DuckDB's
    * `nfc_normalize` (the same UAX #15 transform). */
  val qNfcNormalize = Q(
    "q_nfc_normalize",
    (s, dir) => {
      import graft.plans.TextNative
      val raw = concat(col("text"), lit(" "),
        when(col("doc_id") % 2 === 0, lit("caf\u00e9 latte"))
          .otherwise(lit("cafe\u0301 latte")))
      val norm = TextNative.nfcNormalize(raw)
      Tables(s, dir).documents.select(col("doc_id"),
        length(raw).cast("long").as("raw_cp"),
        length(norm).cast("long").as("norm_cp"),
        (raw =!= norm).as("changed"),
        md5(norm).as("norm_md5"))
    },
    Some("""WITH h AS (
              SELECT doc_id,
                text || ' ' || CASE WHEN doc_id % 2 = 0
                  THEN 'caf' || chr(233) || ' latte'
                  ELSE 'cafe' || chr(769) || ' latte' END AS raw
              FROM documents)
            SELECT doc_id,
              CAST(length(raw) AS BIGINT) AS raw_cp,
              CAST(length(nfc_normalize(raw)) AS BIGINT) AS norm_cp,
              raw <> nfc_normalize(raw) AS changed,
              md5(nfc_normalize(raw)) AS norm_md5
            FROM h"""))

  /** HTML/markup stripping
    * ([[graft.functions.TextFunctions.stripMarkup]]): per-doc HTML is
    * SYNTHESIZED around the document text (script with a `<` in its
    * body, style, comment, tags, all five entities — every branch of
    * the stripper exercised), then stripped back; the oracle replays
    * the identical regex chain in RE2 (shared syntax by construction).
    * Output is md5+length of the cleaned text, so a one-character
    * divergence anywhere fails the hash. */
  val qStripMarkup = Q(
    "q_strip_markup",
    (s, dir) => {
      import graft.functions.TextFunctions
      val html = concat(
        lit("<html><head><title>t</title><style type=\"text/css\">.c { color: red; }</style>" +
          "<script>if (a < b) { f(\"x\"); }</script><!-- note --></head><body><p>"),
        col("text"),
        lit("</p><div class=\"f\">&amp; &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</div></body></html>"))
      val clean = TextFunctions.stripMarkup(html)
      Tables(s, dir).documents.select(col("doc_id"),
        md5(clean).as("clean_md5"),
        length(clean).cast("long").as("clean_len"))
    },
    Some("""WITH h AS (
              SELECT doc_id,
                '<html><head><title>t</title><style type="text/css">.c { color: red; }</style>'
                || '<script>if (a < b) { f("x"); }</script><!-- note --></head><body><p>'
                || text ||
                '</p><div class="f">&amp; &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</div></body></html>'
                  AS html
              FROM documents),
            c AS (
              SELECT doc_id, trim(regexp_replace(
                replace(replace(replace(replace(replace(replace(
                  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                    html,
                    '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
                    '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
                    '(?s)<!--.*?-->', ' ', 'g'),
                    '<[^>]*>', ' ', 'g'),
                  '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                  '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
                '\s+', ' ', 'g')) AS clean
              FROM h)
            SELECT doc_id, md5(clean) AS clean_md5,
              CAST(length(clean) AS BIGINT) AS clean_len
            FROM c"""))

  /** Per-source rank normalization
    * ([[graft.ops.Curation.rankNormalize]]): percentile-calibrated
    * scores within each source — the cross-source-comparable form a
    * mixing decision needs. ONE group-keyed window; rank ties share a
    * value so no id tiebreak is needed for determinism. */
  val qRankNormalize = Q(
    "q_rank_normalize",
    (s, dir) => {
      graft.ops.Curation.rankNormalize(
        Tables(s, dir).documents.select(col("doc_id"), col("source"),
          col("n_chars")),
        "source", "n_chars")
    },
    Some("""SELECT doc_id, source, n_chars,
              floor(percent_rank() OVER (PARTITION BY source
                ORDER BY n_chars) * 10000 + 0.5) / 10000 AS pct
            FROM documents"""))

  /** Phrase-blocklist gate ([[graft.ops.Curation.blocklistFilter]]):
    * token-blocked candidate generation (doc tokens ⋈ broadcast
    * first-token table) + full-phrase verify — never corpus × phrases.
    * The oracle states the naive doc×phrase containment semantics the
    * blocked plan must reproduce; one never-matching phrase pins the
    * zero-hit path. */
  val qBlocklist = Q(
    "q_blocklist",
    (s, dir) => {
      graft.ops.Curation.blocklistFilter(
          Tables(s, dir).documents, "doc_id", "text",
          Seq("table hash", "slow key", "customer join",
            "purple monkey dishwasher"))
        .select(col("doc_id"), col("n_hits"),
          array_join(col("hit_phrases"), ",").as("hits_csv"), col("keep"))
    },
    Some("""WITH p(phrase) AS (VALUES ('table hash'), ('slow key'),
              ('customer join'), ('purple monkey dishwasher')),
            d AS (SELECT doc_id,
                    ' ' || regexp_replace(trim(text), '\s+', ' ', 'g')
                      || ' ' AS t
                  FROM documents),
            hit AS (SELECT d.doc_id, p.phrase FROM d, p
                    WHERE contains(d.t, ' ' || p.phrase || ' ')),
            agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
                      string_agg(phrase, ',' ORDER BY phrase) AS hits_csv
                    FROM hit GROUP BY doc_id)
            SELECT d.doc_id, coalesce(a.n_hits, 0) AS n_hits,
              coalesce(a.hits_csv, '') AS hits_csv,
              a.n_hits IS NULL AS keep
            FROM d LEFT JOIN agg a USING (doc_id)"""))

  /** Interpolated Kneser–Ney bigram smoothing
    * ([[graft.functions.TermStats.kneserNeyBigrams]], D = 0.75): exact
    * BIGINT count/continuation/type statistics over the corpus bigram
    * table, one fixed-order double formula both sides. The oracle
    * restates the textbook definition relationally (left stats from one
    * grouped pass, the novelty count N₁₊(·,w2) from distinct left
    * contexts). */
  val qKneserNey = Q(
    "q_kneser_ney",
    (s, dir) => {
      graft.functions.TermStats.kneserNeyBigrams(
        Tables(s, dir).documents, "text", minCount = 5L)
    },
    Some("""WITH toks AS (
              SELECT list_filter(string_split_regex(trim(text), '\s+'),
                       w -> length(w) > 0) AS t
              FROM documents),
            pairs AS (
              SELECT t[s + 1] AS w1, t[s + 2] AS w2
              FROM (SELECT t, unnest(range(0, len(t) - 1)) AS s
                    FROM toks WHERE len(t) >= 2)),
            bc AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2),
            lf AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
                          CAST(count(*) AS BIGINT) AS t1
                   FROM bc GROUP BY w1),
            ct AS (SELECT w2, CAST(count(*) AS BIGINT) AS cont
                   FROM bc GROUP BY w2),
            bt AS (SELECT CAST(count(*) AS BIGINT) AS btypes FROM bc)
            SELECT w1, w2, c12,
              floor((greatest(c12::DOUBLE - 0.75, 0.0) / c1
                     + 0.75 * t1 / c1 * cont / btypes)
                * 10000 + 0.5) / 10000 AS p_kn
            FROM bc JOIN lf USING (w1) JOIN ct USING (w2), bt
            WHERE c12 >= 5"""))

  /** Full BPE merge-learning loop (10 rounds over the vocabulary-bounded
    * word table), now with a FULL oracle: the iterative state update is
    * unrolled as k MATERIALIZED CTE rounds (the q_hits/q_kcore
    * precedent). Each round re-derives weighted adjacent-pair counts,
    * picks the (count desc, lexicographic) best pair, and replays the
    * exact left-to-right non-overlapping merge rule of
    * [[graft.plans.MergePair]] via a double-separator string replace:
    * pieces encode as ' p1  p2  … ' (single space flanks, double space
    * joins — pieces can never contain a space, the corpus was split on
    * \s+), so `replace(' a  b ' → ' ab ')` consumes matches left to
    * right without letting consecutive merges share a separator.
    * BpeSpec additionally checks the merge sequence against a
    * from-scratch reference implementation. */
  val qBpeTrain = Q(
    "q_bpe_train",
    (s, dir) => {
      val (merges, _) = graft.functions.Bpe.train(
        Tables(s, dir).documents, "text", nMerges = 10)
      import s.implicits._
      merges.toDF().select(col("step").cast("long").as("step"),
        col("left"), col("right"), col("freq"))
    },
    Some(bpeTrainOracle(10)))

  /** Unrolled-round oracle SQL for [[qBpeTrain]] (see its scaladoc). */
  private def bpeTrainOracle(nMerges: Int): String = {
    val rounds = (1 to nMerges).map { r =>
      s"""pairs$r AS (
  SELECT p[1] AS a, p[2] AS b, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT freq, unnest(list_transform(range(1, length(pieces)),
                i -> [pieces[i], pieces[i+1]])) AS p
        FROM w$r WHERE length(pieces) >= 2)
  GROUP BY 1, 2),
best$r AS MATERIALIZED (
  SELECT a, b, cnt FROM pairs$r ORDER BY cnt DESC, a, b LIMIT 1),
w${r + 1} AS MATERIALIZED (
  SELECT word, freq,
    string_split(trim(replace(
      ' ' || array_to_string(pieces, '  ') || ' ',
      ' ' || (SELECT a FROM best$r) || '  ' || (SELECT b FROM best$r) || ' ',
      ' ' || (SELECT a FROM best$r) || (SELECT b FROM best$r) || ' '),
      ' '), '  ') AS pieces
  FROM w$r)"""
    }.mkString(",\n")
    val union = (1 to nMerges).map(r =>
      s"SELECT CAST($r AS BIGINT) AS step, a AS left, b AS right, " +
        s"cnt AS freq FROM best$r").mkString(" UNION ALL ")
    s"""WITH w1 AS MATERIALIZED (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq,
         list_append(regexp_split_to_array(w, ''), '</w>') AS pieces
  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents)
  WHERE w <> '' GROUP BY w),
$rounds
SELECT * FROM ($union)"""
  }

  /** Per-document suffix array over a 1-in-97 document sample (capped at
    * 256 chars): [[graft.ops.SuffixArrays.suffixRanks]] builds ranks by
    * prefix doubling — one doc-keyed exchange, log₂(cap) window rounds —
    * while the oracle sorts each document's suffixes directly
    * (row_number over substr(t, pos)). Equality of the two pins every
    * rank: ranks are tie-free (distinct suffix lengths), and the ASCII
    * strip keeps byte-order comparison identical across engines. */
  val qSuffixArray = Q(
    "q_suffix_array",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .filter(col("doc_id") % 97 === 0)
        .select(col("doc_id"),
          regexp_replace(col("text"), "[^ -~]", "").as("t"))
      graft.ops.SuffixArrays.suffixRanks(docs, "doc_id", "t", cap = 256)
        .select(col("id").as("doc_id"), col("pos"), col("sa_rank"))
    },
    Some("""WITH docs AS (
              SELECT doc_id,
                     substr(regexp_replace(text, '[^ -~]', '', 'g'), 1, 256) AS t
              FROM documents WHERE doc_id % 97 = 0),
            p AS (
              SELECT doc_id, t,
                     unnest(generate_series(1, length(t))) AS pos
              FROM docs WHERE length(t) >= 1)
            SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                   CAST(row_number() OVER (
                     PARTITION BY doc_id ORDER BY substr(t, pos)) AS BIGINT)
                     AS sa_rank
            FROM p"""))

  /** Longest repeated substring per document (1-in-53 sample, 256-char
    * cap): the classic suffix-array + LCP composition — the longest
    * substring occurring twice is exactly the maximum LCP of
    * rank-ADJACENT suffixes (Manber & Myers §3), so after
    * [[graft.ops.SuffixArrays.suffixRanks]] one lag() window and one
    * native `lcp_at` per adjacent pair finish the job. lcp_at evaluates
    * both suffixes in place against the single text value (no
    * doc-length² substring materialization); the oracle recomputes the
    * LCP as the first mismatching offset via a list_filter probe over
    * the same truncated text. This is the exact form of the repetition
    * signal that `q_repetition` approximates with fixed-n n-grams. */
  val qLongestRepeat = Q(
    "q_longest_repeat",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir).documents
        .filter(col("doc_id") % 53 === 0)
        .select(col("doc_id"),
          substring(regexp_replace(col("text"), "[^ -~]", ""), 1, 256).as("t"))
      val ranks = graft.ops.SuffixArrays.suffixRanks(docs, "doc_id", "t", cap = 256)
      // partitioned by doc: the lag window rides the same doc-keyed
      // exchange the rank build already established
      val byRank = Window.partitionBy("id").orderBy("sa_rank")
      val lcps = ranks
        .withColumn("prev_pos", lag(col("pos"), 1).over(byRank))
        .filter(col("prev_pos").isNotNull)
        .join(docs.select(col("doc_id").as("id"), col("t")), "id")
        .select(col("id"),
          graft.plans.TextNative.lcpAt(col("t"), col("prev_pos"), col("pos")).as("lcp"))
        .groupBy(col("id")).agg(max(col("lcp")).as("mr"))
      docs.join(lcps, col("doc_id") === col("id"), "left")
        .select(col("doc_id"), length(col("t")).cast("long").as("len"),
          coalesce(col("mr"), lit(0L)).as("max_repeat"))
    },
    Some("""WITH docs AS (
              SELECT doc_id,
                     substr(regexp_replace(text, '[^ -~]', '', 'g'), 1, 256) AS t
              FROM documents WHERE doc_id % 53 = 0),
            p AS (
              SELECT doc_id, t,
                     unnest(generate_series(1, length(t))) AS pos
              FROM docs WHERE length(t) >= 1),
            r AS (
              SELECT doc_id, t, pos,
                     lag(pos) OVER (
                       PARTITION BY doc_id ORDER BY substr(t, pos)) AS prev_pos
              FROM p),
            l AS (
              SELECT doc_id,
                CASE WHEN prev_pos IS NULL THEN 0 ELSE
                  coalesce(
                    list_min(list_filter(
                      range(1, least(length(t) - pos + 1,
                                     length(t) - prev_pos + 1) + 1),
                      k -> substr(t, pos + k - 1, 1)
                           <> substr(t, prev_pos + k - 1, 1))) - 1,
                    least(length(t) - pos + 1, length(t) - prev_pos + 1))
                END AS lcp
              FROM r)
            SELECT d.doc_id, CAST(length(d.t) AS BIGINT) AS len,
                   CAST(coalesce(max(l.lcp), 0) AS BIGINT) AS max_repeat
            FROM docs d LEFT JOIN l ON d.doc_id = l.doc_id
            GROUP BY d.doc_id, d.t"""))

  /** Corpus-GLOBAL suffix array over the same 1-in-97 sample as
    * q_suffix_array: every suffix of every document in one total
    * lexicographic order (Lee et al. 2022's index shape) — built by
    * [[graft.ops.SuffixArrays.globalSuffixRanks]] with
    * range-partitioned global re-ranks (partition-offset + local dense
    * index; the driver sees one long per partition per round, never a
    * single-partition window). The oracle is the direct global sort:
    * row_number over (suffix, doc_id, pos). */
  val qGlobalSuffix = Q(
    "q_global_suffix",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .filter(col("doc_id") % 97 === 0)
        .select(col("doc_id"),
          regexp_replace(col("text"), "[^ -~]", "").as("t"))
      graft.ops.SuffixArrays.globalSuffixRanks(docs, "doc_id", "t", cap = 256)
        .select(col("id").as("doc_id"), col("pos"), col("gsa_rank"))
    },
    Some("""WITH docs AS (
              SELECT doc_id,
                     substr(regexp_replace(text, '[^ -~]', '', 'g'), 1, 256) AS t
              FROM documents WHERE doc_id % 97 = 0),
            p AS (
              SELECT doc_id, t,
                     unnest(generate_series(1, length(t))) AS pos
              FROM docs WHERE length(t) >= 1)
            SELECT doc_id, CAST(pos AS BIGINT) AS pos,
                   CAST(row_number() OVER (
                     ORDER BY substr(t, pos), doc_id, pos) AS BIGINT)
                     AS gsa_rank
            FROM p"""))

  /** Cross-document repeated spans — Lee et al. 2022's dedup signal
    * computed exactly: for each document, the length of the longest
    * substring it shares with ANY other document. In the global suffix
    * order, the max shared span between two docs is always attained at
    * some rank-ADJACENT pair from different docs (the block of
    * suffixes prefixed by the span contains both docs, so some
    * adjacent pair crosses between them with LCP ≥ span) — so one
    * equality self-join on rank+1 replaces all-pairs comparison, and
    * the per-pair cost is one `lcp_pair` over cap-bounded substrings.
    * No global window anywhere: adjacency is a join, the rollup is an
    * agg. */
  val qCrossRepeat = Q(
    "q_cross_repeat",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .filter(col("doc_id") % 97 === 0)
        .select(col("doc_id"),
          substring(regexp_replace(col("text"), "[^ -~]", ""), 1, 256).as("t"))
      val ranks = graft.ops.SuffixArrays
        .globalSuffixRanks(docs, "doc_id", "t", cap = 256)
      val adj = ranks.as("x")
        .join(ranks.as("y"), col("x.gsa_rank") + 1 === col("y.gsa_rank"))
        .filter(col("x.id") =!= col("y.id"))
        .select(col("x.id").as("ida"), col("x.pos").as("pa"),
          col("y.id").as("idb"), col("y.pos").as("pb"))
      val withTexts = adj
        .join(docs.select(col("doc_id").as("ida"), col("t").as("ta")), "ida")
        .join(docs.select(col("doc_id").as("idb"), col("t").as("tb")), "idb")
        .select(col("ida"), col("idb"),
          graft.plans.TextNative.lcpPair(
            col("ta").substr(col("pa").cast("int"), lit(256)),
            col("tb").substr(col("pb").cast("int"), lit(256))).as("lcp"))
      val sides = withTexts.select(col("ida").as("d"), col("lcp"))
        .unionAll(withTexts.select(col("idb").as("d"), col("lcp")))
        .groupBy(col("d")).agg(max(col("lcp")).as("ms"))
      docs.join(sides, col("doc_id") === col("d"), "left")
        .select(col("doc_id"), coalesce(col("ms"), lit(0L)).as("max_shared"))
    },
    Some("""WITH docs AS (
              SELECT doc_id,
                     substr(regexp_replace(text, '[^ -~]', '', 'g'), 1, 256) AS t
              FROM documents WHERE doc_id % 97 = 0),
            p AS (
              SELECT doc_id, t,
                     unnest(generate_series(1, length(t))) AS pos
              FROM docs WHERE length(t) >= 1),
            r AS (
              SELECT doc_id, t, pos,
                     row_number() OVER (
                       ORDER BY substr(t, pos), doc_id, pos) AS rk
              FROM p),
            adj AS (
              SELECT x.doc_id AS ida, substr(x.t, x.pos) AS sa,
                     y.doc_id AS idb, substr(y.t, y.pos) AS sb
              FROM r x JOIN r y ON y.rk = x.rk + 1
              WHERE x.doc_id <> y.doc_id),
            l AS (
              SELECT ida, idb,
                CAST(coalesce(
                  list_min(list_filter(
                    range(1, least(length(sa), length(sb)) + 1),
                    k -> substr(sa, k, 1) <> substr(sb, k, 1))) - 1,
                  least(length(sa), length(sb))) AS BIGINT) AS lcp
              FROM adj),
            sides AS (
              SELECT ida AS d, lcp FROM l
              UNION ALL SELECT idb, lcp FROM l)
            SELECT d.doc_id,
                   CAST(coalesce(max(s.lcp), 0) AS BIGINT) AS max_shared
            FROM docs d LEFT JOIN sides s ON d.doc_id = s.d
            GROUP BY d.doc_id"""))

  /** Multinomial Naive Bayes language classifier — see
    * [[graft.sim.NaiveBayes]] for the fixed-point model quantization and
    * the token-keyed (never broadcast) likelihood join. Train = docs with
    * doc_id % 5 ≠ 0, test = the held-out fifth; output carries the
    * prediction, the truth and the verdict so the gate pins the entire
    * decision surface (scores are exact longs → argmax is stable). */
  val qNaiveBayes = Q(
    "q_naive_bayes",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val toks = (d: org.apache.spark.sql.DataFrame) => d.select(
        col("doc_id"), col("lang"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      val train = docs.filter(col("doc_id") % 5 =!= 0)
      val test = docs.filter(col("doc_id") % 5 === 0)
      val model = graft.sim.NaiveBayes.train(
        train.select(col("lang")), toks(train), "lang", "tok")
      graft.sim.NaiveBayes.predict(
          model, test.select(col("doc_id")), toks(test), "doc_id", "tok")
        .join(test.select(col("doc_id"), col("lang").as("true_lang")), "doc_id")
        .select(col("doc_id"), col("pred"), col("true_lang"),
          (col("pred") === col("true_lang")).as("correct"))
    },
    Some("""WITH train AS MATERIALIZED (
              SELECT doc_id, lang, text FROM documents WHERE doc_id % 5 != 0),
            test AS MATERIALIZED (
              SELECT doc_id, lang, text FROM documents WHERE doc_id % 5 = 0),
            ttok AS MATERIALIZED (
              SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
              FROM train),
            vsize AS MATERIALIZED (SELECT count(DISTINCT tok) AS v FROM ttok),
            ctot AS MATERIALIZED (
              SELECT lang, count(*) AS total FROM ttok GROUP BY lang),
            cls AS MATERIALIZED (
              SELECT lang, count(*) AS n_docs FROM train GROUP BY lang),
            tot AS MATERIALIZED (SELECT count(*) AS n_total FROM train),
            prior AS MATERIALIZED (
              SELECT c.lang,
                CAST(round(ln(c.n_docs::DOUBLE / t.n_total) * 10000000.0) AS BIGINT) AS prior_fp,
                CAST(round(ln(1.0::DOUBLE / (ct.total + v.v)) * 10000000.0) AS BIGINT) AS default_fp,
                ct.total + v.v AS denom
              FROM cls c, tot t, ctot ct, vsize v WHERE ct.lang = c.lang),
            ll AS MATERIALIZED (
              SELECT k.lang, k.tok,
                CAST(round(ln((k.cnt + 1)::DOUBLE / p.denom) * 10000000.0) AS BIGINT) AS ll_fp
              FROM (SELECT lang, tok, count(*) AS cnt FROM ttok GROUP BY 1, 2) k
              JOIN prior p ON k.lang = p.lang),
            dtok AS MATERIALIZED (
              SELECT doc_id, tok, count(*) AS tf
              FROM (SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
                    FROM test)
              WHERE tok IN (SELECT DISTINCT tok FROM ttok)
              GROUP BY doc_id, tok),
            dl AS MATERIALIZED (
              SELECT dp.doc_id, dp.lang, dp.tf,
                coalesce(l.ll_fp, dp.default_fp) AS ll_fp
              FROM (SELECT d.doc_id, d.tok, d.tf, p.lang, p.default_fp
                    FROM dtok d, prior p) dp
              LEFT JOIN ll l ON l.lang = dp.lang AND l.tok = dp.tok),
            sums AS MATERIALIZED (
              SELECT doc_id, lang, sum(tf * ll_fp) AS s FROM dl GROUP BY 1, 2),
            score AS MATERIALIZED (
              SELECT dp.doc_id, dp.lang, dp.prior_fp + coalesce(s.s, 0) AS score_fp
              FROM (SELECT td.doc_id, p.lang, p.prior_fp
                    FROM (SELECT DISTINCT doc_id FROM test) td, prior p) dp
              LEFT JOIN sums s ON s.doc_id = dp.doc_id AND s.lang = dp.lang),
            pred AS MATERIALIZED (
              SELECT doc_id,
                (min(struct_pack(ns := -score_fp, lab := lang))).lab AS pred
              FROM score GROUP BY doc_id)
            SELECT p.doc_id, p.pred, t.lang AS true_lang,
              (p.pred = t.lang) AS correct
            FROM pred p JOIN test t ON p.doc_id = t.doc_id"""))

  /** Winnowing fingerprints (Schleimer–Wilkerson–Aiken 2003, k=8 w=16)
    * over normalized document text — see [[graft.ops.Winnow]] for the
    * zero-shuffle scan-side plan. md5 hex selection order is
    * engine-portable, so the oracle replays the exact window-minimum
    * recursion (as an explode+window, which is what the array form
    * computes without the exchange). */
  val qWinnow = Q(
    "q_winnow",
    (s, dir) => graft.ops.Winnow.fingerprints(
      Tables(s, dir).documents, "doc_id", "text", k = 8, w = 16),
    Some("""WITH d AS (
              SELECT doc_id,
                regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
              FROM documents),
            g AS (
              SELECT doc_id,
                     unnest(generate_series(1,
                       least(length(s), 1048576) - 7)) AS p,
                     s, least(length(s), 1048576) - 7 AS n,
                     length(s) > 1048576 AS truncated
              FROM d WHERE length(s) >= 23),
            h AS (SELECT doc_id, p, n, truncated,
                    md5(substr(s, p, 8)) AS hh FROM g),
            wmin AS (
              SELECT doc_id, p, n, truncated,
                     min(hh) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
              FROM h)
            SELECT DISTINCT doc_id, fp, truncated
            FROM wmin WHERE p <= n - 15"""))

  /** Near-duplicate pairs from shared winnowing fingerprints: equi-join on
    * the fingerprint value (never all-pairs), ≥3 shared = a guaranteed
    * shared normalized substring run. The winnowing guarantee makes this
    * the substring-level complement of MinHash's bag-of-shingles view.
    * Fingerprints in >64 documents are dropped as boilerplate (the
    * stop-gram cap — see [[graft.ops.Winnow.nearDuplicates]]): template
    * text is not near-dup signal, and the cap is what keeps pair
    * enumeration linear in corpus size (sf1 audit: one 3.8k-doc template
    * bucket otherwise emits 7M pairs in a single task). */
  val qWinnowPairs = Q(
    "q_winnow_pairs",
    (s, dir) => {
      val fps = graft.ops.Winnow.fingerprints(
        Tables(s, dir).documents, "doc_id", "text", k = 8, w = 16)
      graft.ops.Winnow.nearDuplicates(fps, "doc_id", minShared = 3L,
        maxDocFreq = 64L)
    },
    Some("""WITH d AS (
              SELECT doc_id,
                regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
              FROM documents),
            g AS (
              SELECT doc_id, unnest(generate_series(1, length(s) - 7)) AS p,
                     s, length(s) - 7 AS n
              FROM d WHERE length(s) >= 23),
            h AS (SELECT doc_id, p, n, md5(substr(s, p, 8)) AS hh FROM g),
            wmin AS (
              SELECT doc_id, p, n,
                     min(hh) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
              FROM h),
            fps0 AS (SELECT DISTINCT doc_id, fp FROM wmin WHERE p <= n - 15),
            kept AS (SELECT fp FROM fps0 GROUP BY fp HAVING count(*) <= 64),
            fps AS (SELECT doc_id, f.fp FROM fps0 f JOIN kept USING (fp))
            SELECT x.doc_id AS a, y.doc_id AS b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM fps x JOIN fps y ON x.fp = y.fp AND x.doc_id < y.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 3"""))

  /** Winnowing near-dup pairs at the PRODUCTION stop-gram cap (round 16)
    * — the auto-sized sibling of [[qWinnowPairs]], the IVF `nlist = 0`
    * pattern applied to the boilerplate cap: `maxDocFreq = 0` derives
    * cap = max(16, ⌈4 × mean fingerprint doc-frequency⌉) from the corpus
    * itself ([[graft.ops.Winnow.autoDocFreqCap]] — mean df is
    * corpus-size-stable, so the cap converges while template buckets
    * that grow ∝ corpus always fall above it). The derivation is exact
    * integer arithmetic, so the oracle recomputes the identical cap from
    * the identical relation. */
  val qWinnowPairsScaled = Q(
    "q_winnow_pairs_scaled",
    (s, dir) => {
      val fps = graft.ops.Winnow.fingerprints(
        Tables(s, dir).documents, "doc_id", "text", k = 8, w = 16)
      graft.ops.Winnow.nearDuplicates(fps, "doc_id", minShared = 3L,
        maxDocFreq = 0L)
    },
    Some("""WITH d AS (
              SELECT doc_id,
                regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS s
              FROM documents),
            g AS (
              SELECT doc_id, unnest(generate_series(1, length(s) - 7)) AS p,
                     s, length(s) - 7 AS n
              FROM d WHERE length(s) >= 23),
            h AS (SELECT doc_id, p, n, md5(substr(s, p, 8)) AS hh FROM g),
            wmin AS (
              SELECT doc_id, p, n,
                     min(hh) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
              FROM h),
            fps0 AS (SELECT DISTINCT doc_id, fp FROM wmin WHERE p <= n - 15),
            cap AS (
              SELECT greatest(16, (4 * count(*) + count(DISTINCT fp) - 1)
                       // count(DISTINCT fp)) AS c
              FROM fps0),
            kept AS (
              SELECT fp FROM fps0 GROUP BY fp
              HAVING count(*) <= (SELECT c FROM cap)),
            fps AS (SELECT doc_id, f.fp FROM fps0 f JOIN kept USING (fp))
            SELECT x.doc_id AS a, y.doc_id AS b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM fps x JOIN fps y ON x.fp = y.fp AND x.doc_id < y.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 3"""))

  /** Hash-ring negative sampling (see [[graft.ops.Sampling.ringNegatives]]):
    * k=2 deterministic negatives per document from the bucketed md5 ring —
    * contrastive-training pair assembly whose draw is a pure function of
    * (seed, id), so the oracle replays the identical ring walk. */
  val qRingNegatives = Q(
    "q_ring_negatives",
    (s, dir) => graft.ops.Sampling.ringNegatives(
        Tables(s, dir).documents, "doc_id", k = 2, seed = "r9", numBuckets = 16)
      .select(col("anchor_id"), col("i").cast("long").as("i"), col("neg_id")),
    Some("""WITH ring AS (
              SELECT doc_id AS id, md5('r9:' || doc_id::VARCHAR) AS h,
                ((strpos('0123456789abcdef',
                    substr(md5('r9:' || doc_id::VARCHAR), 1, 1)) - 1) * 16
                  + strpos('0123456789abcdef',
                    substr(md5('r9:' || doc_id::VARCHAR), 2, 1)) - 1) % 16 AS bkt
              FROM documents),
            pos AS (
              SELECT id, bkt,
                row_number() OVER (PARTITION BY bkt ORDER BY h, id) AS rn,
                count(*) OVER (PARTITION BY bkt) AS cnt
              FROM ring),
            anchors AS (
              SELECT p.id AS anchor_id, p.bkt, i.i,
                ((p.rn - 1 + i.i) % p.cnt) + 1 AS target_rn
              FROM pos p, (SELECT unnest(range(1, 3)) AS i) i)
            SELECT a.anchor_id, a.i, p.id AS neg_id
            FROM anchors a
            JOIN pos p ON a.bkt = p.bkt AND a.target_rn = p.rn
            WHERE p.id <> a.anchor_id"""))

  /** Leakage-safe split (see [[graft.ops.Sampling.leakageSafeSplit]]):
    * train/val assignment keyed on the CONTENT hash, so exact duplicates
    * can never straddle the split — per-split doc and distinct-content
    * counts (the oracle recomputes both from the same group key; the
    * no-straddle invariant is additionally spec-pinned on a corpus with
    * planted duplicates). */
  val qLeakageSplit = Q(
    "q_leakage_split",
    (s, dir) => graft.ops.Sampling.leakageSafeSplit(
        Tables(s, dir).documents, md5(col("text")), valBuckets = 64)
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_groups")),
    Some("""SELECT CASE WHEN bucket < 64 THEN 'val' ELSE 'train' END AS split,
              count(*) AS n_docs, count(DISTINCT md5(text)) AS n_groups
            FROM (
              SELECT text,
                (strpos('0123456789abcdef',
                   substr(md5(md5(text)), 1, 1)) - 1) * 16
                + strpos('0123456789abcdef',
                   substr(md5(md5(text)), 2, 1)) - 1 AS bucket
              FROM documents)
            GROUP BY 1"""))

  /** RAKE keyword extraction ([[graft.functions.TermStats.rakeKeywords]],
    * Rose et al. 2010): stopword-delimited candidate phrases, word score
    * deg/freq, phrase score = Σ word scores, top-3 per doc. The oracle
    * re-derives segmentation (running stopword count), both word stats
    * and the ranking relationally. */
  val qRake = Q(
    "q_rake",
    (s, dir) => {
      graft.functions.TermStats.rakeKeywords(
        Tables(s, dir).documents, "doc_id", "text", k = 3)
    },
    Some("""WITH frags0 AS (
              SELECT doc_id,
                string_split_regex(lower(trim(text)), '[^a-z0-9\s]+') AS fs
              FROM documents),
            frags AS (
              SELECT doc_id, unnest(range(1, len(fs) + 1)) AS fi,
                unnest(fs) AS frag
              FROM frags0),
            toks0 AS (
              SELECT doc_id, fi, string_split_regex(frag, '\s+') AS ts
              FROM frags),
            toks1 AS (
              SELECT doc_id, fi, unnest(range(1, len(ts) + 1)) AS i,
                unnest(ts) AS tok
              FROM toks0),
            toks AS (
              SELECT doc_id, fi, i, tok,
                tok IN ('the','a','of','and','to','in','is','it') AS is_stop
              FROM toks1 WHERE length(tok) > 0),
            words AS (
              SELECT doc_id, fi, i, tok, pid FROM (
                SELECT *, sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id, fi ORDER BY i
                        ROWS UNBOUNDED PRECEDING) AS pid
                FROM toks)
              WHERE NOT is_stop),
            wl AS (
              SELECT doc_id, fi, pid, i, tok,
                count(*) OVER (PARTITION BY doc_id, fi, pid) AS plen
              FROM words),
            wstats AS (
              SELECT tok, sum(plen)::DOUBLE / count(*) AS wscore
              FROM wl GROUP BY tok),
            phr AS (
              SELECT doc_id, fi, pid,
                string_agg(tok, ' ' ORDER BY i) AS phrase,
                sum(wscore) AS score
              FROM wl JOIN wstats USING (tok) GROUP BY doc_id, fi, pid),
            ded AS (
              SELECT doc_id, phrase, max(score) AS score
              FROM phr GROUP BY doc_id, phrase),
            rk AS (
              SELECT doc_id, phrase, score, row_number() OVER
                (PARTITION BY doc_id ORDER BY score DESC, phrase) AS rank
              FROM ded)
            SELECT doc_id, phrase,
              floor(score * 10000 + 0.5) / 10000 AS score,
              CAST(rank AS BIGINT) AS rank
            FROM rk WHERE rank <= 3"""))

  /** Unicode script profile ([[graft.functions.TextFunctions.scriptCount]]
    * family): per-script character counts by range-class regexp —
    * scan-stage, no explode — plus the priority-tiebroken dominant
    * script. Both the counts and the CASE chain are generated from ONE
    * range table (`TextFunctions.scriptClasses`), Java-regex syntax on
    * the Spark side, RE2 `\x{…}` on the oracle side. */
  val qScriptDetect = Q(
    "q_script_detect",
    (s, dir) => {
      import graft.functions.TextFunctions._
      val counts = scriptClasses.map { case (n, r) =>
        n -> scriptCount(col("text"), r)
      }
      Tables(s, dir).documents.select(
        (col("doc_id") +:
          counts.map { case (n, c) => c.as(s"n_$n") }) :+
          dominantScript(counts).as("dominant"): _*)
    },
    Some {
      val classes = graft.functions.TextFunctions.scriptClasses
      def re2(r: Seq[(Int, Int)]): String =
        r.map { case (a, b) => f"\\x{$a%04x}-\\x{$b%04x}" }
          .mkString("[", "", "]")
      val counts = classes.map { case (n, r) =>
        s"length(text) - length(regexp_replace(text, '${re2(r)}', '', 'g')) AS n_$n"
      }.mkString(",\n              ")
      val cases = classes.zipWithIndex.map { case ((n, _), i) =>
        val rest = classes.drop(i + 1).map("n_" + _._1)
        val beats = if (rest.isEmpty) s"n_$n > 0"
          else s"n_$n > 0 AND n_$n >= greatest(${rest.mkString(", ")})"
        s"WHEN $beats THEN '$n'"
      }.mkString("\n              ")
      s"""WITH c AS (
            SELECT doc_id,
              $counts
            FROM documents)
          SELECT doc_id, ${classes.map("n_" + _._1).mkString(", ")},
            CASE $cases ELSE 'none' END AS dominant
          FROM c"""
    })

  /** Luhn-validated card-number detection
    * ([[graft.functions.TextFunctions.luhnValid]]): 13–16-digit runs
    * (maximal — a 17-digit run is NOT a card) checked against the
    * ISO/IEC 7812 checksum. The corpus carries no card numbers, so each
    * doc is augmented with one deterministic doc_id-derived 16-digit
    * run (~10% Luhn-valid by chance) and one known-valid test PAN —
    * both sides synthesize identically, and the oracle re-runs the full
    * fold (reverse → double-every-second → mod 10) per candidate. */
  val qLuhnScan = Q(
    "q_luhn_scan",
    (s, dir) => {
      import graft.functions.TextFunctions.luhnValid
      val aug = concat(col("text"), lit(" "),
        lpad(((col("doc_id") * 7919 + 13) % 10000000000000000L)
          .cast("string"), 16, "0"),
        lit(" 4111111111111111"))
      val runs = filter(regexp_extract_all(aug, lit("[0-9]+"), lit(0)),
        r => length(r) >= 13 && length(r) <= 16)
      Tables(s, dir).documents.select(
        col("doc_id"),
        size(runs).cast("long").as("n_runs"),
        size(filter(runs, r => luhnValid(r))).cast("long").as("n_valid"))
    },
    Some("""WITH aug AS (
              SELECT doc_id, text || ' ' ||
                lpad(((doc_id * 7919 + 13) % 10000000000000000)::VARCHAR,
                  16, '0') || ' 4111111111111111' AS t
              FROM documents),
            runs AS (
              SELECT doc_id,
                list_filter(regexp_extract_all(t, '[0-9]+'),
                  r -> length(r) BETWEEN 13 AND 16) AS rs
              FROM aug)
            SELECT doc_id, CAST(len(rs) AS BIGINT) AS n_runs,
              CAST(len(list_filter(rs, s ->
                list_sum(list_transform(range(1, length(s) + 1), i ->
                  CASE WHEN i % 2 = 0 THEN
                    CASE WHEN 2 * (ascii(substring(reverse(s), i, 1)) - 48) > 9
                      THEN 2 * (ascii(substring(reverse(s), i, 1)) - 48) - 9
                      ELSE 2 * (ascii(substring(reverse(s), i, 1)) - 48) END
                  ELSE ascii(substring(reverse(s), i, 1)) - 48 END))
                % 10 = 0)) AS BIGINT) AS n_valid
            FROM runs"""))

  /** Flesch reading ease + Flesch–Kincaid grade
    * ([[graft.functions.TextFunctions.syllables]]): sentences = [.!?]+
    * fragments with content, words = [a-z]+ runs of the lowercased text,
    * syllables = per-word vowel-run heuristic summed by a scan-stage
    * fold (no explode — the whole profile is one projection). Division
    * guards floor sentence/word counts at 1 on both sides. */
  val qReadability = Q(
    "q_readability",
    (s, dir) => {
      import graft.functions.TextFunctions.syllables
      val toks = filter(split(lower(col("text")), "[^a-z]+"),
        t => length(t) > 0)
      val nw = size(toks).cast("long")
      val nsyl = aggregate(transform(toks, t => syllables(t)), lit(0),
        (a, x) => a + x).cast("long")
      val nsent = size(filter(split(col("text"), "[.!?]+"),
        f => length(trim(f)) > 0)).cast("long")
      val wD = greatest(nw, lit(1L)).cast("double")
      val sD = greatest(nsent, lit(1L)).cast("double")
      val fl4 = (c: org.apache.spark.sql.Column) =>
        floor(c * 10000 + lit(0.5)) / 10000
      Tables(s, dir).documents.select(
        col("doc_id"), nsent.as("n_sents"), nw.as("n_words"),
        nsyl.as("n_syllables"),
        fl4(lit(206.835) - lit(1.015) * (nw.cast("double") / sD)
          - lit(84.6) * (nsyl.cast("double") / wD)).as("reading_ease"),
        fl4(lit(0.39) * (nw.cast("double") / sD)
          + lit(11.8) * (nsyl.cast("double") / wD) - lit(15.59))
          .as("fk_grade"))
    },
    Some("""WITH t AS (
              SELECT doc_id,
                list_filter(string_split_regex(lower(text), '[^a-z]+'),
                  x -> length(x) > 0) AS toks,
                len(list_filter(string_split_regex(text, '[.!?]+'),
                  f -> length(trim(f)) > 0)) AS n_sents
              FROM documents),
            c AS (
              SELECT doc_id, CAST(n_sents AS BIGINT) AS n_sents,
                CAST(len(toks) AS BIGINT) AS n_words,
                CAST(list_sum(list_transform(toks, w -> greatest(
                  CASE WHEN regexp_matches(w, 'e$')
                        AND NOT regexp_matches(w, 'le$')
                        AND len(regexp_extract_all(w, '[aeiouy]+')) >= 2
                    THEN len(regexp_extract_all(w, '[aeiouy]+')) - 1
                    ELSE len(regexp_extract_all(w, '[aeiouy]+')) END,
                  1))) AS BIGINT) AS n_syllables
              FROM t)
            SELECT doc_id, n_sents, n_words,
              coalesce(n_syllables, 0) AS n_syllables,
              floor((206.835
                - 1.015 * (n_words::DOUBLE / greatest(n_sents, 1)::DOUBLE)
                - 84.6 * (coalesce(n_syllables, 0)::DOUBLE
                          / greatest(n_words, 1)::DOUBLE))
                * 10000 + 0.5) / 10000 AS reading_ease,
              floor((0.39 * (n_words::DOUBLE / greatest(n_sents, 1)::DOUBLE)
                + 11.8 * (coalesce(n_syllables, 0)::DOUBLE
                          / greatest(n_words, 1)::DOUBLE)
                - 15.59) * 10000 + 0.5) / 10000 AS fk_grade
            FROM c"""))

  /** Corpus drift monitor: per-term Jensen–Shannon divergence
    * contributions between the even- and odd-numbered sources —
    * the distribution-shift alarm run between two crawl snapshots or
    * source cohorts. Laplace-smoothed probabilities from EXACT integer
    * counts (per-term doubles are then bit-identical across engines, so
    * the top-10 ranking needs no tolerance); outputs ppm-scaled values
    * (raw JS terms round to zero at 4 decimals). Vocabulary-bounded
    * aggregate + a 1-row broadcast of totals + TakeOrderedAndProject —
    * no corpus shuffle, no window. */
  val qJsDrift = Q(
    "q_js_drift",
    (s, dir) => {
      val toks = Tables(s, dir).documents
        .select(col("source"),
          explode(split(trim(col("text")), "\\s+")).as("term"))
        .filter(length(col("term")) > 0)
        .withColumn("b",
          expr("CAST(substring(source, 4, 10) AS INT) % 2"))
      val tc = toks.groupBy(col("term")).agg(
        sum(when(col("b") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("b") === 1, 1L).otherwise(0L)).as("n_b"))
      val tot = tc.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"),
        count(lit(1)).as("v"))
      val p = (col("n_a") + 1).cast("double") /
        (col("ta") + col("v")).cast("double")
      val q = (col("n_b") + 1).cast("double") /
        (col("tb") + col("v")).cast("double")
      val fl4 = (c: org.apache.spark.sql.Column) =>
        floor(c * 10000 + lit(0.5)) / 10000
      tc.crossJoin(broadcast(tot))
        .withColumn("p", p).withColumn("q", q)
        .withColumn("m", (col("p") + col("q")) / 2)
        .withColumn("js",
          lit(0.5) * col("p") * log(col("p") / col("m"))
            + lit(0.5) * col("q") * log(col("q") / col("m")))
        .orderBy(col("js").desc, col("term")).limit(10)
        .select(col("term"), col("n_a"), col("n_b"),
          fl4(col("p") * 1000000).as("p_ppm"),
          fl4(col("q") * 1000000).as("q_ppm"),
          fl4(col("js") * 1000000).as("js_ppm"))
    },
    Some("""WITH toks AS (
              SELECT CAST(substring(source, 4, 10) AS INT) % 2 AS b,
                unnest(string_split_regex(trim(text), '\s+')) AS term
              FROM documents),
            tc AS (
              SELECT term,
                sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS n_a,
                sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS n_b
              FROM toks WHERE length(term) > 0 GROUP BY term),
            tot AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb,
                      count(*) AS v FROM tc),
            scored AS (
              SELECT term, n_a, n_b,
                (n_a + 1)::DOUBLE / (ta + v)::DOUBLE AS p,
                (n_b + 1)::DOUBLE / (tb + v)::DOUBLE AS q
              FROM tc, tot),
            js AS (
              SELECT term, n_a, n_b, p, q,
                0.5 * p * ln(p / ((p + q) / 2))
                  + 0.5 * q * ln(q / ((p + q) / 2)) AS js
              FROM scored)
            SELECT term, CAST(n_a AS BIGINT) AS n_a,
              CAST(n_b AS BIGINT) AS n_b,
              floor(p * 1000000 * 10000 + 0.5) / 10000 AS p_ppm,
              floor(q * 1000000 * 10000 + 0.5) / 10000 AS q_ppm,
              floor(js * 1000000 * 10000 + 0.5) / 10000 AS js_ppm
            FROM js ORDER BY js DESC, term LIMIT 10"""))

  /** N-gram novelty profile in ingestion order: for each doc, the
    * fraction of its trigram INSTANCES whose first corpus occurrence
    * (min doc_id — the ingest order) is this very doc — the
    * diminishing-returns curve of continued crawling, and the
    * instance-level complement of q_decontaminate's set overlap.
    * First-occurrence is a partial-aggregatable min on the gram key;
    * the join back is gram-keyed; ratios are exact-integer counts with
    * one final division. */
  val qNgramNovelty = Q(
    "q_ngram_novelty",
    (s, dir) => {
      val grams = flatten(transform(array(split(trim(col("text")), "\\s+")),
        ts => when(size(ts) >= 3,
            transform(sequence(lit(1), size(ts) - 2),
              i => concat_ws(" ", slice(ts, i, lit(3)))))
          .otherwise(array().cast("array<string>"))))
      val g = Tables(s, dir).documents
        .select(col("doc_id"), explode(grams).as("g"))
        .localCheckpoint(false) // per-(g,doc) counts + per-doc totals
      // round 19: the old shape joined the FULL gram-instance relation
      // back against first-seen on the string gram (instance-sized
      // string-keyed shuffle). Same result without that join: an
      // instance is novel iff its doc is the gram's min doc, so
      // n_novel(d) = Σ over grams first seen in d of that doc's own
      // instance count — (g, doc) counts, min-struct per gram, one tiny
      // doc-keyed sum. Shuffles shrink from instance-sized to
      // distinct-(g,doc)-sized; no string join remains.
      val perDoc = g.groupBy(col("g"), col("doc_id"))
        .agg(count(lit(1)).as("c"))
      val firstC = perDoc.groupBy(col("g"))
        .agg(min(struct(col("doc_id"), col("c"))).as("f"))
        .select(col("f").getField("doc_id").as("doc_id"),
          col("f").getField("c").as("c"))
      val novel = firstC.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_novel"))
      g.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
        .join(novel, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          (floor(coalesce(col("n_novel"), lit(0L)).cast("double")
            / col("n_grams") * 10000 + 0.5) / 10000).as("novelty"))
    },
    Some("""WITH toks AS (
              SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM documents),
            g AS (
              SELECT doc_id, unnest(list_transform(
                range(1, greatest(len(t) - 2, 0) + 1),
                i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS g
              FROM toks),
            fs AS (SELECT g, min(doc_id) AS fd FROM g GROUP BY g)
            SELECT x.doc_id, count(*) AS n_grams,
              CAST(sum(CASE WHEN fs.fd = x.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
              floor(CAST(sum(CASE WHEN fs.fd = x.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS novelty
            FROM g x JOIN fs USING (g)
            GROUP BY x.doc_id"""))

  /** Term burstiness (Church & Gale 1995): the variance-to-mean ratio
    * of a term's per-document counts over the documents CONTAINING it —
    * VMR ≈ 1 is Poisson (function words), VMR ≫ 1 is bursty (topical
    * content words; the signal behind Katz's K-mixture and tf
    * saturation in BM25). Computed from EXACT integer moments
    * (n·Σc² − (Σc)²)/((n−1)·Σc) with one final division — no float
    * summation anywhere. Vocabulary-bounded aggregates only. */
  val qBurstiness = Q(
    "q_burstiness",
    (s, dir) => {
      val tc = Tables(s, dir).documents
        .select(col("doc_id"),
          explode(split(trim(col("text")), "\\s+")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("term"), col("doc_id"))
        .agg(count(lit(1)).as("c"))
      tc.groupBy(col("term"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("c")).as("total"),
          sum(col("c") * col("c")).as("sc2"))
        .filter(col("n_docs") >= 10)
        .select(col("term"), col("n_docs"), col("total"),
          (floor((col("n_docs") * col("sc2") - col("total") * col("total"))
              .cast("double")
            / ((col("n_docs") - 1) * col("total"))
            * 10000 + 0.5) / 10000).as("vmr"))
    },
    Some("""WITH tc AS (
              SELECT term, doc_id, count(*) AS c FROM (
                SELECT doc_id,
                  unnest(string_split_regex(trim(text), '\s+')) AS term
                FROM documents)
              WHERE length(term) > 0 GROUP BY term, doc_id),
            m AS (
              SELECT term, count(*) AS n_docs, sum(c) AS total,
                sum(c * c) AS sc2
              FROM tc GROUP BY term)
            SELECT term, n_docs, CAST(total AS BIGINT) AS total,
              floor((n_docs * sc2 - total * total)::DOUBLE
                / ((n_docs - 1) * total) * 10000 + 0.5) / 10000 AS vmr
            FROM m WHERE n_docs >= 10"""))

  /** Zipf rank–frequency fit (Zipf 1949): OLS slope of ln(freq) on
    * ln(rank) over the full vocabulary — the canonical corpus health
    * check (natural text ≈ −1; a slope near 0 screams templated/
    * synthetic text). Ranks come from an exact count-of-better self
    * join (no global window, no unpartitioned-window warning); the OLS
    * moments are ORDERED list folds on both engines, so every float
    * accumulates in rank order. */
  val qZipfFit = Q(
    "q_zipf_fit",
    (s, dir) => {
      val tc = Tables(s, dir).documents
        .select(explode(split(trim(col("text")), "\\s+")).as("term"))
        .filter(length(col("term")) > 0)
        .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      val ranked = tc.as("a").join(tc.as("b"),
          col("b.cnt") > col("a.cnt")
            || (col("b.cnt") === col("a.cnt")
                && col("b.term") < col("a.term")), "left")
        .groupBy(col("a.term"), col("a.cnt"))
        .agg((count(col("b.term")) + 1).as("rank"))
        .select(col("a.cnt").as("cnt"), col("rank"))
      val one = ranked
        .agg(collect_list(struct(col("rank"), col("cnt"))).as("ps"),
          count(lit(1)).cast("double").as("n"))
        .withColumn("sorted", array_sort(col("ps")))
        .withColumn("xs", transform(col("sorted"),
          p => log(p.getField("rank").cast("double"))))
        .withColumn("ys", transform(col("sorted"),
          p => log(p.getField("cnt").cast("double"))))
        .withColumn("sx", aggregate(col("xs"), lit(0.0), (a, x) => a + x))
        .withColumn("sy", aggregate(col("ys"), lit(0.0), (a, x) => a + x))
        .withColumn("sxx",
          aggregate(col("xs"), lit(0.0), (a, x) => a + x * x))
        .withColumn("sxy", aggregate(
          zip_with(col("xs"), col("ys"), (x, y) => x * y),
          lit(0.0), (a, x) => a + x))
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      one.select(col("n").cast("long").as("n_terms"),
        (floor(slope * 10000 + 0.5) / 10000).as("slope"),
        (floor((col("sy") - slope * col("sx")) / col("n") * 10000 + 0.5)
          / 10000).as("intercept"))
    },
    Some("""WITH tc AS (
              SELECT term, count(*) AS cnt FROM (
                SELECT unnest(string_split_regex(trim(text), '\s+'))
                  AS term
                FROM documents)
              WHERE length(term) > 0 GROUP BY term),
            ranked AS (
              SELECT a.cnt,
                1 + count(b.term) AS rank
              FROM tc a LEFT JOIN tc b
                ON b.cnt > a.cnt OR (b.cnt = a.cnt AND b.term < a.term)
              GROUP BY a.term, a.cnt),
            lists AS (
              SELECT count(*)::DOUBLE AS n,
                list(ln(rank::DOUBLE) ORDER BY rank) AS xs,
                list(ln(cnt::DOUBLE) ORDER BY rank) AS ys
              FROM ranked),
            moms AS (
              SELECT n,
                list_sum(xs) AS sx, list_sum(ys) AS sy,
                list_sum(list_transform(xs, x -> x * x)) AS sxx,
                list_sum(list_transform(range(1, len(xs) + 1),
                  i -> xs[i] * ys[i])) AS sxy
              FROM lists)
            SELECT CAST(n AS BIGINT) AS n_terms,
              floor((n * sxy - sx * sy) / (n * sxx - sx * sx)
                * 10000 + 0.5) / 10000 AS slope,
              floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                / n * 10000 + 0.5) / 10000 AS intercept
            FROM moms"""))

  /** Quality-classifier training step (fastText-style logistic regression,
    * the GPT-3/CCNet corpus gate): one full-batch GD step over scan-stage
    * document features with label "is English". The whole step is a single
    * partial-aggregatable global sum (the model rides the agg buffer); the
    * oracle recomputes per-row sigmoid, gradient sums and mean log-loss
    * relationally. */
  val qLogregStep = Q(
    "q_logreg_step",
    (s, dir) => {
      val nw = size(split(trim(col("text")), "\\s+")).cast("double")
      graft.ops.Curation.logregStep(
        Tables(s, dir).documents,
        features = Seq(lit(1.0), log(lit(1.0) + col("n_chars")),
          nw / 10.0, col("n_chars") / (nw * 10.0)),
        label = col("lang") === "en",
        w0 = Seq(-1.0, 0.2, -0.1, 0.05), eta = 0.05)
    },
    Some("""WITH f AS (
              SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
                1.0 AS x0,
                ln(1.0 + n_chars) AS x1,
                len(string_split_regex(trim(text), '\s+')) / 10.0 AS x2,
                n_chars / (len(string_split_regex(trim(text), '\s+')) * 10.0) AS x3
              FROM documents),
            p AS (
              SELECT y, x0, x1, x2, x3,
                1.0 / (1.0 + exp(-(-1.0*x0 + 0.2*x1 + -0.1*x2 + 0.05*x3))) AS pr
              FROM f),
            pc AS (
              SELECT y, x0, x1, x2, x3, pr,
                greatest(least(pr, 1.0 - 1e-12), 1e-12) AS prc
              FROM p),
            g AS (
              SELECT count(*)::DOUBLE AS n,
                sum((pr - y) * x0) AS g0, sum((pr - y) * x1) AS g1,
                sum((pr - y) * x2) AS g2, sum((pr - y) * x3) AS g3,
                sum(-(y * ln(prc) + (1.0 - y) * ln(1.0 - prc))) AS l
              FROM pc),
            w(feature, w_old) AS (VALUES (0, -1.0), (1, 0.2), (2, -0.1), (3, 0.05))
            SELECT CAST(feature AS BIGINT) AS feature,
              CAST(w_old AS DOUBLE) AS w_old,
              floor((CASE feature WHEN 0 THEN g0 WHEN 1 THEN g1
                     WHEN 2 THEN g2 ELSE g3 END / n) * 10000 + 0.5) / 10000 AS grad,
              floor((w_old - 0.05 * (CASE feature WHEN 0 THEN g0 WHEN 1 THEN g1
                     WHEN 2 THEN g2 ELSE g3 END / n)) * 10000 + 0.5) / 10000 AS w_new,
              floor((l / n) * 10000 + 0.5) / 10000 AS train_loss
            FROM w, g"""))

  /** DoReMi domain reweighting (arXiv:2305.10429): one exponentiated-
    * gradient step over per-source mean proxy loss (here the deterministic
    * ln(1+n_chars) stand-in for a proxy-LM loss), uniform prior, uniform
    * smoothing — the training-mixture math a 100 TB pipeline reruns every
    * proxy checkpoint. Domain-sized aggregation only; the corpus never
    * shuffles. */
  val qMixtureWeights = Q(
    "q_mixture_weights",
    (s, dir) => {
      graft.ops.Curation.mixtureWeights(
        Tables(s, dir).documents, "source",
        loss = log(lit(1.0) + col("n_chars")), eta = 5.0, smooth = 0.1)
    },
    Some("""WITH d AS (
              SELECT source AS domain, ln(1.0 + n_chars) AS l FROM documents),
            g AS (
              SELECT domain, count(*) AS n_docs, avg(l) AS dl
              FROM d GROUP BY domain),
            r AS (SELECT avg(l) AS ref FROM d),
            s AS (
              SELECT domain, n_docs, dl,
                greatest(0.0, dl - ref) AS excess,
                exp(5.0 * greatest(0.0, dl - ref)) AS score
              FROM g, r),
            z AS (SELECT sum(score) AS z, count(*)::DOUBLE AS dd FROM s)
            SELECT domain, CAST(n_docs AS BIGINT) AS n_docs,
              floor(dl * 10000 + 0.5) / 10000 AS domain_loss,
              floor(excess * 10000 + 0.5) / 10000 AS excess,
              floor((0.9 * score / z + 0.1 / dd) * 10000 + 0.5) / 10000 AS alpha
            FROM s, z"""))

  def all: Seq[Q] = Seq(qNaiveBayes, qLangId, qQualityScore, qTokenCount, qFingerprint,
    qLogregStep, qMixtureWeights, qMixtureApply,
    qCorpusStats, qPiiScrub, qHashSample, qRepetition, qPack,
    qStratifiedSample, qShardShuffle, qBm25, qDomainGate, qBpePairs,
    qGopherRules, qChunk, qTemperatureMix, qDsirWeights, qGreedyPieces,
    qPerplexity, qCcnetBuckets, qC4Filter, qEpochMix, qTfidf, qPmi, qKneserNey, qNfcNormalize, qStripMarkup, qRankNormalize, qBlocklist, qBpeTrain,
    qWeightedSample, qEntropy, qRrfFusion, qSuffixArray, qLongestRepeat,
    qGlobalSuffix, qCrossRepeat, qWinnow, qWinnowPairs, qWinnowPairsScaled,
    qRingNegatives,
    qLeakageSplit, qChi2Terms, qFeatureHash, qRake, qScriptDetect, qLuhnScan, qReadability, qJsDrift, qNgramNovelty, qBurstiness, qZipfFit)
}
