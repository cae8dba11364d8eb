package graft

import graft.dedup.Dedup
import graft.functions.TextFunctions._
import graft.sim.Ann
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount handles empty and multi-space text") {
    val df = Seq("", "  ", "a b", "a  b   c").toDF("t")
    val out = df.select(tokenCount(col("t"))).as[Long].collect().toSeq
    assert(out == Seq(0L, 0L, 2L, 3L))
  }

  test("shingles produces distinct n-grams; short text yields empty") {
    val df = Seq("a b c d", "a b").toDF("t")
    val out = df.select(shingles(col("t"), 3)).as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq.empty)
  }

  test("lineDedup keeps first occurrence globally and reassembles in order") {
    // doc 1 owns "x y" at line 0; doc 2 repeats it (cross-doc dup) and
    // repeats its own "p q" (within-doc dup); doc 3 is ALL dups → empty
    val df = Seq(
      (1L, Seq("x y", "a b")),
      (2L, Seq("p q", "x y", "p q", "r s")),
      (3L, Seq("a b", "x y")))
      .toDF("doc_id", "lines")
    val out = Dedup.lineDedup(df, "doc_id", col("lines"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == (("x y\na b", 2L, 0L)))
    assert(out(2L) == (("p q\nr s", 2L, 2L)))
    assert(out(3L) == (("", 0L, 2L)))
  }

  test("prefixFilterJoin equals brute-force all-pairs Jaccard (lossless filter)") {
    // deterministic pseudo-random docs over a small vocab so that pairs
    // straddle the threshold both ways; brute force computed in-memory
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 40).map(i => s"w$i")
    val docs = (1 to 60).map { id =>
      val m = 3 + rnd.nextInt(10)
      id.toLong -> (0 until m).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val df = docs.toDF("doc_id", "text")
    val got = Dedup.prefixFilterJoin(df, "doc_id", "text", threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sets = docs.map { case (id, t) => id -> t.split("\\s+").toSet }.toMap
    val want = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size
      j = inter.toDouble / (sets(a).size + sets(b).size - inter)
      if j >= 0.4
    } yield (a, b)).toSet
    assert(want.nonEmpty, "test vector must produce at least one pair")
    assert(got == want)
  }

  test("prefixFilterJoin indexes only the rarest-token prefix") {
    // two identical docs (J=1.0) and one unrelated: the pair survives and
    // the common-word-only doc pairs with nothing despite sharing "the"
    val df = Seq(
      (1L, "alpha beta gamma the"),
      (2L, "alpha beta gamma the"),
      (3L, "the the the")).toDF("doc_id", "text")
    val got = Dedup.prefixFilterJoin(df, "doc_id", "text", 0.8)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 1.0)))
  }

  test("duplicatedNgramProfile counts cross-doc shared n-grams per doc") {
    // 2-grams: doc1 {a b, b c}, doc2 {a b, b x}, doc3 {q r} ; "a b" is the
    // only shared gram → doc1 1/2, doc2 1/2, doc3 0/1
    val df = Seq((1L, "a b c"), (2L, "a b x"), (3L, "q r")).toDF("doc_id", "text")
    val out = Dedup.duplicatedNgramProfile(df, "doc_id", "text", n = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((1L, 0L, 0.0)))
  }

  test("duplicatedNgramProfile shuffles 8-byte gram hashes, never pairs") {
    // at 100 TB neither side broadcasts — force the shuffle path and pin
    // the shape: gram semi join + partial-agg count, no pair/cross join
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val docs = Tables(spark, sf).documents
      val plan = Dedup.duplicatedNgramProfile(docs, "doc_id", "text", n = 3)
        .queryExecution.executedPlan.toString
      assert(plan.contains("LeftSemi"), s"expected gram semi join:\n$plan")
      assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
        s"all-pairs join appeared:\n$plan")
      // every exchange keys on a gram hash or an id — raw gram/doc text
      // never crosses a shuffle
      val badKey = """hashpartitioning\([^)]*\b(g|text)#""".r
      assert(!plan.linesIterator.exists(l => badKey.findFirstIn(l).isDefined),
        s"text crossed a shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("semDedup keeps the min-id representative per semantic group") {
    // ids 0,1 seed the two clusters (deterministic first-k init);
    // 2 and 4 are near-copies of 0, 3 is a near-copy of 1 — all dropped
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f)),
      (2L, Seq(0.99f, 0.02f)),
      (3L, Seq(0.01f, 1.01f)),
      (4L, Seq(0.98f, 0.03f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semDedup(df, "vec_id", "embedding", nlist = 2, threshold = 0.995)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 0L, 1L -> 1L))
  }

  test("exactKeepBest keeps the highest-scored copy, id breaks score ties") {
    val df = Seq(
      (1L, "same", 0.2), (2L, "same", 0.9), (3L, "same", 0.9), // best score tie → min id 2
      (4L, "solo", 0.1))
      .toDF("doc_id", "text", "trust")
    val out = Dedup.exactKeepBest(df, "doc_id", "text", col("trust"))
      .collect().map(r => r.getLong(1) -> ((r.getDouble(2), r.getLong(3)))).toMap
    assert(out == Map(2L -> ((0.9, 3L)), 4L -> ((0.1, 1L))))
  }

  test("incrementalExact drops seen content, keeps batch-min for new content") {
    val seen = Seq("old text").toDF("t").select(md5(col("t")).as("content_hash"))
    val batch = Seq(
      (10L, "old text"), // already in history → dropped
      (11L, "fresh"), (12L, "fresh"), // within-batch dup → keep 11
      (13L, "unique"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalExact(batch, "doc_id", "text", seen)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(11L -> 2L, 13L -> 1L))
  }

  test("bpePairStats weights adjacent pairs by word frequency, ties break on pair") {
    // words: low ×2, lower ×1 → lo:3, ow:3, we:1, er:1
    val df = Seq("low low lower").toDF("t")
    val out = bpePairStats(df, "t", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("lo", 3L), ("ow", 3L), ("er", 1L)))
  }

  test("fingerprint collides for reordered/duplicated tokens") {
    val df = Seq(("x", "b a a c"), ("y", "a b c c"), ("z", "a b d")).toDF("id", "t")
    val fps = df.select(col("id"), fingerprint(col("t")).as("fp"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fps("x") == fps("y"))
    assert(fps("x") != fps("z"))
  }

  test("simhash of near-identical docs is hamming-close, distinct docs far") {
    val df = Seq(
      ("a", "spark makes big data processing fast and scalable for everyone today"),
      ("b", "spark makes big data processing fast and scalable for everyone now"),
      ("c", "completely unrelated text about gardening tulips roses and soil ph"))
      .toDF("id", "t")
    val fp = df.select(col("id"), simhash(col("t")).as("fp")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(fp("a"), fp("b")) < ham(fp("a"), fp("c")))
  }

  test("minhashLsh finds a true near-duplicate pair") {
    val base = "the quick brown fox jumps over the lazy dog again and again every single day"
    val df = Seq(
      (1L, base),
      (2L, base + " tonight"), // near-dup
      (3L, "entirely different content with no overlap whatsoever in any shingle at all ok"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(df, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("portable minhash/simhash lanes find the true near-dup and skip the unrelated doc") {
    val base = "the quick brown fox jumps over the lazy dog again and again every single day"
    val df = Seq(
      (1L, base),
      (2L, base + " tonight"), // near-dup
      (3L, "entirely different content with no overlap whatsoever in any shingle at all ok"))
      .toDF("doc_id", "text")
    val mh = Dedup.minhashLsh(df, "doc_id", "text", portable = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(mh.contains((1L, 2L)))
    assert(!mh.exists(p => p._1 == 3L || p._2 == 3L))
    // portable simhash: 60-bit fingerprint — near-dup pair is closer than
    // either doc is to the unrelated one, and the fp fits in 60 bits
    val sh = Dedup.simhashPairs(df, "doc_id", "text",
        maxHamming = 60, chunks = 4, portable = true)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(sh((1L, 2L)) < sh.getOrElse((1L, 3L), 61) &&
      sh((1L, 2L)) < sh.getOrElse((2L, 3L), 61))
  }

  test("120-bit wide simhash: lane 0 is the 60-bit vote, lane 1 the back-half lane, pairs match the registry near-dup") {
    val base = "the quick brown fox jumps over the lazy dog again and again every single day"
    val df = Seq(
      (2L, base),
      (4L, base + " tonight"), // near-dup
      (6L, "entirely different content with no overlap whatsoever in any shingle at all ok"))
      .toDF("doc_id", "text")
    // lane 0 of the wide fingerprint IS the 60-bit portable fingerprint
    // (same digests, same vote); lane 1 equals the composable
    // conv(substring(md5, 17, 15)) vote — the hex-chars convention the
    // oracle uses
    val wide = df.select(col("doc_id"),
        graft.plans.TextNative.portableSimhash120(col("text")).as("fp"))
      .select(col("doc_id"), element_at(col("fp"), 1).as("fp0"),
        element_at(col("fp"), 2).as("fp1"))
    val lane0 = df.select(col("doc_id"),
      graft.plans.TextNative.portableSimhash60(col("text")).as("fp0"))
    assert(wide.select("doc_id", "fp0").except(lane0).count() == 0L)
    val lane1 = df.select(col("doc_id"),
        transform(array_distinct(filter(split(trim(col("text")), "\\s+"),
            t => length(t) > 0)),
          t => conv(substring(md5(t), 17, 15), 16, 10).cast("long")).as("th"))
      .select(col("doc_id"), simhashFromHashes(col("th")).as("fp1"))
    assert(wide.select("doc_id", "fp1").except(lane1).count() == 0L)
    // both lanes fit in 60 bits
    assert(wide.filter(col("fp0") < 0 || col("fp1") < 0 ||
      shiftright(col("fp0"), 60) =!= 0 || shiftright(col("fp1"), 60) =!= 0)
      .count() == 0L)
    // the near-dup pair is hamming-closer over 120 bits than either doc
    // is to the unrelated one
    val sh = Dedup.simhashPairsWide(df, "doc_id", "text",
        maxHamming = 120, chunks = 6)
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(sh((2L, 4L)) < sh.getOrElse((2L, 6L), 121) &&
      sh((2L, 4L)) < sh.getOrElse((4L, 6L), 121))
    // token-less docs emit nothing (NULL fingerprint, both lanes)
    val empty = Seq((1L, ""), (2L, "  ")).toDF("doc_id", "text")
    assert(Dedup.simhashPairsWide(empty, "doc_id", "text").count() == 0L)
    // invalid chunk layouts are rejected loudly
    intercept[IllegalArgumentException] {
      Dedup.simhashPairsWide(df, "doc_id", "text", chunks = 5)
    }
  }

  test("native portable md5 hashes equal the conv(substring(md5,…)) convention") {
    // the fused expressions slice digest BYTES; the gate convention is hex
    // chars — h1 = chars 1..15, h2 = chars 16..23. Pin them equal on texts
    // covering ascii, unicode, single-char and long tokens.
    val df = Seq("the quick brown fox", "héllo wörld ünïcode tokens",
      "a b c d e f g h", "xyzzy").toDF("text")
    val sh = df.select(shingles(col("text"), 2).as("sh"))
      .filter(size(col("sh")) > 0)
    val composable = sh.select(transform(col("sh"), { s =>
      val m = md5(s)
      struct(
        conv(substring(m, 1, 15), 16, 10).cast("long").as("h1"),
        conv(substring(m, 16, 8), 16, 10).cast("long").as("h2"))
    }).as("hs"))
      .select(array((0 until 16).map { i =>
        array_min(transform(col("hs"), h =>
          h.getField("h1") + lit(i.toLong) * h.getField("h2")))
      }: _*).as("sig"))
      .as[Seq[Long]].collect().toSeq
    val native = sh
      .select(graft.plans.TextNative.portableMinhashSig(col("sh"), 16).as("sig"))
      .as[Seq[Long]].collect().toSeq
    assert(native == composable)

    val votedFp = df.select(
      transform(array_distinct(filter(split(trim(col("text")), "\\s+"),
          t => length(t) > 0)),
        t => conv(substring(md5(t), 1, 15), 16, 10).cast("long")).as("th"))
      .filter(size(col("th")) > 0)
      .select(simhashFromHashes(col("th")).as("fp"))
      .as[Long].collect().toSeq
    val nativeFp = df.select(
        graft.plans.TextNative.portableSimhash60(col("text")).as("fp"))
      .filter(col("fp").isNotNull)
      .as[Long].collect().toSeq
    assert(nativeFp == votedFp)
    // token-less docs yield NULL, never a zero fingerprint
    val empty = Seq("", "   ").toDF("text")
      .select(graft.plans.TextNative.portableSimhash60(col("text")).as("fp"))
      .filter(col("fp").isNotNull).count()
    assert(empty == 0L)
  }

  test("decontaminate flags exactly the train docs sharing an n-gram with the test set") {
    val train = Seq(
      (1L, "the quick brown fox jumps high"),
      (2L, "completely unrelated words here today"),
      (3L, "a quick brown fox appears")).toDF("id", "text")
    val test = Seq("watch the quick brown fox run").toDF("text")
    val out = Dedup.decontaminate(train, "id", "text", test, "text", n = 3)
      .orderBy("id").as[(Long, Long, Boolean)].collect().toSeq
    // doc 1 shares "the quick brown"+"quick brown fox"; doc 3 shares
    // "quick brown fox"; doc 2 shares nothing
    assert(out == Seq((1L, 2L, true), (2L, 0L, false), (3L, 1L, true)))
  }

  test("repetition stats: dup-word fraction and top-bigram run count") {
    import graft.functions.TextFunctions
    val df = Seq(
      (1L, "spam spam spam spam"),
      (2L, "all words differ here")).toDF("doc_id", "text")
    val rows = df.select(col("doc_id") +: TextFunctions.repetitionStats(col("text")): _*)
      .select(col("doc_id") +: TextFunctions.repetitionMetrics(col("__rep")): _*)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Long, Double)].collect()
    // "spam spam spam spam": 4 words 1 distinct, bigram "spam spam" ×3 of 3
    assert(rows(0) == ((1L, 4L, 1L, 0.75, 3L, 1.0)))
    assert(rows(1) == ((2L, 4L, 4L, 0.0, 1L, 0.3333))) // 1 of 3 bigrams
  }

  test("gopher rule battery: stats and composite verdict") {
    import graft.functions.TextFunctions
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dogs today"),
      (2L, "# ### 123 456 ...")).toDF("doc_id", "text")
    val rows = df
      .select(col("doc_id") +: TextFunctions.gopherStats(col("text"), minWords = 3): _*)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Double, Long, Long)].collect()
    // doc1: 10 words, 41 non-space chars → 4.1 mean, no symbols, all alpha,
    // 'the' ×2 → verdict pass
    assert(rows(0) == ((1L, 10L, 4.1, 0.0, 1.0, 2L, 1L)))
    // doc2: 5 tokens (#, ###, 123, 456, ...), 4 '#' + 1 '...' symbols → ratio 1.0,
    // mean word len 13/5=2.6 < 3, zero alpha words, zero stopwords → fail
    assert(rows(1) == ((2L, 5L, 2.6, 1.0, 0.0, 0L, 0L)))
  }

  test("substringSpanDedup cuts duplicated k-gram spans, keeps unique text") {
    val df = Seq(
      (1L, "one two three four five six"),
      (2L, "zz one two three qq"),
      (3L, "totally unique words here"),
      (4L, "p q r p q r p q")).toDF("doc_id", "text")
    val out = Dedup.substringSpanDedup(df, "doc_id", "text", k = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      // "one two three" shared with doc2 → covers positions 0-2
      (1L, 6L, 3L, "four five six"),
      (2L, 5L, 3L, "zz qq"),
      (3L, 4L, 0L, "totally unique words here"),
      // every 3-gram repeats within the doc → everything cut
      (4L, 8L, 8L, "")))
  }

  test("greedyPieces: longest-match wins, unk advances one char, doc order kept") {
    import graft.plans.TextNative
    val vocab = Seq("the", "spark", "sc", "an", "a", "t", "s", "h")
    val df = Seq((1L, "thespark scant xyz"), (2L, "  ")).toDF("id", "text")
    val out = df.select(col("id"),
        TextNative.greedyPieces(col("text"), vocab).as("p"))
      .orderBy("id").as[(Long, Seq[String])].collect().toSeq
    assert(out(0) == ((1L, Seq("the", "spark", "sc", "an", "t", "<unk>", "<unk>", "<unk>"))))
    assert(out(1) == ((2L, Seq.empty[String]))) // blank text → no pieces
  }

  test("greedyPieces: unk advances one code point — non-BMP chars give ONE unk") {
    import graft.plans.TextNative
    val vocab = Seq("ok")
    // 😀 is U+1F600 (a surrogate pair in UTF-16): must be a single <unk>,
    // matching the oracle's character-based advance, not two.
    val df = Seq((1L, "ok😀ok")).toDF("id", "text")
    val out = df.select(TextNative.greedyPieces(col("text"), vocab).as("p"))
      .as[Seq[String]].head()
    assert(out == Seq("ok", "<unk>", "ok"))
  }

  test("editDistancePairs: typo pairs surface once, blocks and buckets bound the join") {
    val df = Seq(
      (1L, "en", "web", "the quick brown fox"),
      (2L, "en", "web", "the quick brown fux"),   // dist 1 → pair (1,2)
      (3L, "en", "web", "completely different words"), // far from both
      (4L, "en", "books", "the quick brown fox"), // other block: no pair with 1
      (5L, "de", "web", "the quick brown fox")    // other block: no pair with 1
    ).toDF("id", "lang", "source", "text")
    val out = graft.dedup.Dedup.editDistancePairs(
        df, "id", "text", Seq("lang", "source"), prefixLen = 32, maxDist = 3)
      .as[(Long, Long, Long)].collect().toList
    assert(out == List((1L, 2L, 1L)))
  }

  test("editDistancePairs: adjacent length buckets meet exactly once (no dup pairs)") {
    // len 4 (bucket 1) vs len 6 (bucket 2) with W = maxDist+1 = 3:
    // the pair crosses a bucket boundary and must appear exactly once
    val df = Seq((1L, "abcd"), (2L, "abcdef")).toDF("id", "text")
      .withColumn("blk", org.apache.spark.sql.functions.lit("x"))
    val out = graft.dedup.Dedup.editDistancePairs(
        df, "id", "text", Seq("blk"), prefixLen = 32, maxDist = 2)
      .as[(Long, Long, Long)].collect().toList
    assert(out == List((1L, 2L, 2L)))
  }

  test("exact dedup keeps min id and counts copies") {
    val df = Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("id", "text")
    val r = Dedup.exact(df, "id", "text").orderBy("keep_id")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSeq
    assert(r == Seq((1L, 2L), (3L, 1L)))
  }

  test("brute-force cosine topk: identical vector ranks first with cosine 1") {
    val emb = Tables(spark, sf).embeddings
    val q = Ann.queryVector(spark, emb, "vec_id", 3L, "embedding")
    val top = Ann.bruteForceTopK(emb, "vec_id", "embedding", q, 5).collect()
    assert(top.head.getAs[Long]("id") == 3L)
    assert(math.abs(top.head.getAs[Double]("cosine") - 1.0) < 1e-9)
  }

  test("IVF top-1 agrees with brute force for the self-query") {
    val emb = Tables(spark, sf).embeddings.limit(200)
    val q = Ann.queryVector(spark, emb, "vec_id", 3L, "embedding")
    val index = Ann.ivfBuild(emb, "vec_id", "embedding", nlist = 8)
    val ivf = Ann.ivfTopK(index, q, nprobe = 8, k = 1).collect() // all lists probed = exact
    assert(ivf.head.getAs[Long]("id") == 3L)
  }

  test("IVF assignment is a zero-shuffle projection (no Exchange in plan)") {
    // no limit: a limit would itself add an Exchange on a multi-partition
    // source and mask what this pins — the assignment projection alone
    val emb = Tables(spark, sf).embeddings
    val vecs = emb.select($"vec_id".as("id"), $"embedding".as("v"))
    val cents = Seq((0L, Seq.fill(64)(0.1)), (1L, Seq.fill(64)(0.9)))
    val plan = Ann.assignTo(vecs, cents).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assignment plan shuffles:\n$plan")
  }

  test("IVF assignment at nlist=1024 keeps constant plan size and survives strict codegen") {
    // the round-2 literal-inlined argmin exploded plan size O(nlist×dims)
    // and would hit Janino method limits here; NearestCentroid keeps the
    // matrix as ONE literal. codegen.fallback=false turns any silent
    // interpreted-mode fallback into a hard failure.
    val cents = (0L until 1024L).map(c =>
      c -> Seq.tabulate(64)(j => ((c * 64 + j) % 97).toDouble / 97.0))
    val vecs = Tables(spark, sf).embeddings
      .select($"vec_id".as("id"), $"embedding".as("v"))
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val assigned = Ann.assignTo(vecs, cents)
      // constant expression-tree size: the matrix is ONE literal node. The
      // round-2 inlined argmin was O(nlist×dims) nodes (≈130k here).
      val exprNodes = assigned.queryExecution.optimizedPlan.expressions
        .map(e => e.collect { case x => x }.size).sum
      assert(exprNodes < 100, s"expression tree grew with nlist: $exprNodes nodes")
      // correctness vs a driver-side argmin (same (dist, cid) tie-break)
      val sample = assigned.select($"id", $"v", $"cid").limit(5).collect()
      sample.foreach { r =>
        val v = r.getSeq[Number](1).map(_.doubleValue())
        val best = cents.map { case (cid, cv) =>
          (v.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, cid)
        }.min._2
        assert(r.getLong(2) == best)
      }
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("k-means training improves or preserves IVF recall vs brute force") {
    val emb = Tables(spark, sf).embeddings.limit(300)
    val q = Ann.queryVector(spark, emb, "vec_id", 5L, "embedding")
    val exact = Ann.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .select("id").as[Long].collect().toSet
    val trained = Ann.ivfBuild(emb, "vec_id", "embedding", nlist = 8, trainIters = 2)
    assert(trained.centroids.size == 8)
    val got = Ann.ivfTopK(trained, q, nprobe = 4, k = 10)
      .select("id").as[Long].collect().toSet
    // probing half the lists must still recover most of the true top-10
    assert((exact intersect got).size >= 5, s"recall too low: $got vs $exact")
  }

  test("containmentPairs: directed doc-in-doc signal, both-direction emit") {
    // doc 1's bigrams {a b, b c} are ALL inside doc 2 (containment 1.0)
    // while 2⊂1 is only 2/5 = 0.4; docs 3/4 are identical (mutual 1.0);
    // doc 5 shares nothing
    val df = Seq(
      (1L, "a b c"),
      (2L, "a b c d e f"),
      (3L, "p q r"),
      (4L, "p q r"),
      (5L, "z z z"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(df, "doc_id", "text", n = 2, threshold = 0.5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(out == Map((1L, 2L) -> 1.0, (3L, 4L) -> 1.0, (4L, 3L) -> 1.0))
    // lowering the threshold admits the reverse direction at 0.4
    val loose = Dedup.containmentPairs(df, "doc_id", "text", n = 2, threshold = 0.4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(loose((2L, 1L)) == 0.4)
  }

  test("boilerplateProfile: corpus-frequent lines flag per-doc ratios") {
    // "nav bar" appears in docs 1,2,3 (df=3 → boiler at minDocs=3);
    // "x y" in docs 1,2 only (df=2 → clean); doc 3 repeats the boiler
    // line twice — both occurrences count in ITS ratio, but the doc
    // counts once toward frequency
    val df = Seq(
      (1L, Seq("nav bar", "x y", "body a")),
      (2L, Seq("nav bar", "x y")),
      (3L, Seq("nav bar", "nav bar", "body b")),
      (4L, Seq("body c")))
      .toDF("doc_id", "lines")
    val out = Dedup.boilerplateProfile(df, "doc_id", col("lines"), minDocs = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((3L, 1L, 0.3333)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((3L, 2L, 0.6667)))
    assert(out(4L) == ((1L, 0L, 0.0)))
  }

  test("cdcChunks: lengths reassemble, deterministic, edit-local boundaries") {
    // deterministic pseudo-random text (repetitive text would put a
    // boundary everywhere or nowhere)
    val text = (1 to 400).map(i => ('a' + (i * 7919 % 26)).toChar).mkString
    val edited = text.substring(0, 50) + "XYZ" + text.substring(50)
    def chunksOf(t: String): Seq[(Long, Long, String)] =
      graft.ops.Chunking.cdcChunks(
          Seq((1L, t)).toDF("doc_id", "text"), "doc_id", "text")
        .select(col("chunk_no"), col("chunk_len"), col("chunk_md5"))
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    val c1 = chunksOf(text)
    // chunk lengths cover the text exactly, in order
    assert(c1.map(_._2).sum == text.length)
    assert(c1.map(_._1) == (1L to c1.size))
    // deterministic across runs
    assert(chunksOf(text) == c1)
    // content-defined locality: the edit at position 50 must leave the
    // chunks after its neighborhood identical (a fixed-width splitter
    // would shift every later chunk)
    val c2 = chunksOf(edited)
    val shared = c1.map(_._3).toSet.intersect(c2.map(_._3).toSet)
    assert(shared.size >= c1.size - 3,
      s"edit rewrote ${c1.size - shared.size} of ${c1.size} chunks")
    assert(c2.map(_._2).sum == edited.length)
  }

  test("cdcChunks maxChars skew cap: only the first cap chars chunk, loudly") {
    val text = (1 to 4000).map(i => ('a' + (i * 7919 % 26)).toChar).mkString
    val cap = 1000
    val capped = graft.ops.Chunking.cdcChunks(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
        maxChars = cap)
      .select(col("chunk_no"), col("chunk_len"), col("chunk_md5"),
        col("truncated"))
      .as[(Long, Long, String, Boolean)].collect().sortBy(_._1).toSeq
    assert(capped.forall(_._4), "capped rows must carry truncated = true")
    assert(capped.map(_._2).sum == cap, "chunks must cover exactly cap chars")
    // ≡ uncapped chunking of the prefix
    val pre = graft.ops.Chunking.cdcChunks(
        Seq((1L, text.substring(0, cap))).toDF("doc_id", "text"),
        "doc_id", "text")
      .select(col("chunk_no"), col("chunk_len"), col("chunk_md5"),
        col("truncated"))
      .as[(Long, Long, String, Boolean)].collect().sortBy(_._1).toSeq
    assert(pre.forall(!_._4))
    assert(capped.map(c => (c._1, c._2, c._3)) == pre.map(c => (c._1, c._2, c._3)))
  }

  test("cdc_cuts native ≡ the conv(substring(md5)) column formula") {
    // round-19: the fused one-pass boundary scan must reproduce the
    // previous formula's cuts exactly — including on non-ASCII text,
    // where char positions and UTF-8 byte offsets diverge
    val k = 8
    val mask = 63
    val maxChars = 64
    val texts = Seq(
      (1 to 300).map(i => ('a' + (i * 7919 % 26)).toChar).mkString,
      "héllo wörld — ünïcode paddéd " * 12,
      "短い非ASCIIテキストの繰り返し。" * 10,
      (1 to 40).map(i => ('A' + (i * 31 % 26)).toChar).mkString, // < maxChars
      "exactly-k" // barely above k
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("id", "__s")
      .withColumn("__n", least(length(col("__s")), lit(maxChars)))
      .filter(col("__n") >= k)
    val gramHash = (p: org.apache.spark.sql.Column) =>
      conv(substring(md5(col("__s").substr(p, lit(k))), 1, 15), 16, 10)
        .cast("long")
    val formula = array_sort(array_distinct(concat(
      array(lit(0)),
      transform(
        filter(sequence(lit(1), col("__n") - (k - 1)),
          p => gramHash(p) % (mask + 1) === 0),
        p => p + (k - 1)),
      array(col("__n")))))
    val got = df.select(col("id"),
        graft.plans.TextNative.cdcCuts(col("__s"), k, mask, maxChars)
          .as("native"),
        formula.as("formula"))
      .as[(Long, Seq[Int], Seq[Int])].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, n, f) =>
      assert(n == f, s"doc $id: native $n != formula $f")
    }
  }
}
