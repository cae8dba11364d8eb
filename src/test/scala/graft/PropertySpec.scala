package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style tests: ScalaCheck-generated corpora checked in one batch
  * against independent driver-side reference implementations. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private implicit class TripleOps(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[(Long, Long), Long] =
      rows.map { case (a, b, n) => (a, b) -> n }.toMap
  }

  private val words = Seq("spark", "row", "agg", "shuffle", "plan", "col", "a", "the", "of")
  private val genText: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, Gen.oneOf(words)).map(_.mkString(" ")))

  // deterministic corpus: fixed seed
  private val corpus: Seq[String] =
    Gen.listOfN(60, genText).apply(Gen.Parameters.default, Seed(42L)).get

  private def refTokens(t: String): Seq[String] = {
    val tr = t.trim
    if (tr.isEmpty) Seq.empty else tr.split("\\s+").toSeq
  }

  private def refShingles(t: String, n: Int): Seq[String] =
    refTokens(t).sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq.distinct

  test("shingles matches reference sliding-distinct for generated corpus") {
    val df = corpus.toDF("t")
    val got = df.select(col("t"), shingles(col("t"), 3).as("sh"))
      .as[(String, Seq[String])].collect().toMap
    corpus.foreach { t =>
      assert(got(t) == refShingles(t, 3), s"for text '$t'")
    }
  }

  test("tokenCount matches reference for generated corpus incl. empties") {
    val all = "" +: "   " +: corpus
    val got = all.toDF("t").select(col("t"), tokenCount(col("t"))).as[(String, Long)]
      .collect().toMap
    all.foreach(t => assert(got(t) == refTokens(t).size.toLong, s"for '$t'"))
  }

  test("MarkerOps.count equals the SQL replace trick on adversarial strings") {
    // the oracles spell (len(p) - len(replace(p, n, ''))) / len(n) —
    // non-overlapping left-to-right; adjacent repeats share a delimiter
    // space and count once per pair. Random strings over a tiny alphabet
    // maximize overlap/adjacency cases the corpus never hits.
    def refCount(padded: String, needle: String): Long =
      (padded.length - padded.replace(needle, "").length) / needle.length
    val gen = Gen.listOfN(200, Gen.chooseNum(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "a b")).map(_.mkString(" "))))
    val texts = gen.apply(Gen.Parameters.default, Seed(11L)).get
    val needles = Seq(" a ", " b ", " ab ", " a b ")
    texts.foreach { t =>
      val padded = " " + t + " "
      needles.foreach { n =>
        assert(graft.plans.MarkerOps.count(padded, n) == refCount(padded, n),
          s"for text '$t' needle '$n'")
      }
    }
  }

  test("langId (native MarkerBest) matches the composable greatest-struct formulation") {
    // pin the native one-pass argmax to the original column-composed
    // semantics it replaced (round 12): per-language replace-trick counts,
    // greatest(struct(score, lang)) pick, 'unk' when nothing matches —
    // including the equal-score lexicographic tiebreak.
    def refLang(t: String): String = {
      val padded = s" $t "
      def cnt(w: String): Long = {
        val n = s" $w "
        (padded.length - padded.replace(n, "").length) / n.length
      }
      val scores = defaultMarkers.toSeq.map { case (l, ws) => (ws.map(cnt).sum, l) }
      val (best, lang) = scores.max
      if (best > 0) lang else "unk"
    }
    val markers = Seq("the", "a", "of", "and", "le", "la", "et", "de",
      "der", "die", "und", "das", "el", "los", "y", "que")
    val gen = Gen.listOfN(120, Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(markers ++ Seq("x", "zz"))).map(_.mkString(" "))))
    val texts = gen.apply(Gen.Parameters.default, Seed(13L)).get
    val got = texts.toDF("t")
      .select(col("t"), langId(col("t"), defaultMarkers).as("l"))
      .as[(String, String)].collect().toMap
    texts.foreach(t => assert(got(t) == refLang(t), s"for '$t'"))
    // NULL text → 'unk', not NULL: the column-composed form's null score
    // structs fell through to the otherwise branch; the native MarkerBest
    // is null-in/null-out, so langId coalesces to keep the old contract.
    val nullLang = Seq[Option[String]](None).toDF("t")
      .select(langId(col("t"), defaultMarkers)).head().getString(0)
    assert(nullLang == "unk")
  }

  test("SRP sizing invariant: wider bands shrink candidate buckets, never grow them") {
    // The round-13 scale lesson (PLANS.md): at FIXED bitsPerBand the
    // candidate-pair count is quadratic in corpus size; the production
    // path scales bits with log2(corpus). Pin the mechanism the sizing
    // relies on: each extra hyperplane splits every bucket in two in
    // expectation, so candidate pairs shrink as bands widen — asserted
    // monotone on this fixed deterministic corpus.
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        math.sin(i * 0.7 + d * 1.3).toFloat))
    }.toDF("id", "v")
    def pairs(bits: Int): Long =
      graft.sim.Srp.signatures(vecs, "id", "v", dims = 8, nBands = 2,
          bitsPerBand = bits)
        .groupBy(col("band"), col("sig")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * (col("n") - 1) / 2)).head().getDouble(0).toLong
    val ps = Seq(2, 4, 6, 8).map(pairs)
    assert(ps == ps.sorted.reverse, s"pairs not monotone in bits: $ps")
    assert(ps.head > ps.last, s"widening 2->8 bits should strictly shrink: $ps")
  }

  test("winnow maxDocFreq cap: capped pairs are the uncapped pairs minus hot-fp support") {
    import graft.ops.Winnow
    val docs = corpus.zipWithIndex
      .map { case (t, i) => (i.toLong, (t + " ") * 3) } // repetition → shared fps
      .toDF("id", "text")
    val fps = Winnow.fingerprints(docs, "id", "text", k = 4, w = 4)
    // -1 = exact uncapped enumeration (0 is the AUTO stop-gram cap)
    val uncapped = Winnow.nearDuplicates(fps, "id", minShared = 1L,
        maxDocFreq = -1L)
      .select(col("a"), col("b"), col("n_shared")).as[(Long, Long, Long)]
      .collect().toMap2
    val capped = Winnow.nearDuplicates(fps, "id", minShared = 1L, maxDocFreq = 3L)
      .select(col("a"), col("b"), col("n_shared")).as[(Long, Long, Long)]
      .collect().toMap2
    // reference: recompute per-fp doc frequency and the capped support
    val fpRows = fps.select(col("id"), col("fp")).as[(Long, String)].collect()
    val df_ = fpRows.groupBy(_._2).view.mapValues(_.length).toMap
    val keptRows = fpRows.filter { case (_, f) => df_(f) <= 3 }
    val refPairs = keptRows.groupBy(_._2).values.flatMap { rows =>
      val ids = rows.map(_._1).distinct.sorted
      for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(capped == refPairs)
    // capped support never exceeds uncapped for any pair
    capped.foreach { case (p, n) => assert(n <= uncapped.getOrElse(p, 0L), s"pair $p") }
  }

  test("fingerprint equals md5 of sorted distinct lowercase tokens") {
    def ref(t: String): String = {
      val joined = refTokens(t.toLowerCase).distinct.sorted.mkString(" ")
      java.security.MessageDigest.getInstance("MD5")
        .digest(joined.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val nonEmpty = corpus.filter(_.trim.nonEmpty)
    val got = nonEmpty.toDF("t").select(col("t"), fingerprint(col("t")))
      .as[(String, String)].collect().toMap
    nonEmpty.foreach(t => assert(got(t) == ref(t), s"for '$t'"))
  }

  test("hamming64 equals Long.bitCount of xor") {
    val pairs = Gen.listOfN(50, Gen.zip(Gen.long, Gen.long))
      .apply(Gen.Parameters.default, Seed(7L)).get
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"), hamming64(col("a"), col("b")).cast("int"))
      .as[(Long, Long, Int)].collect()
    got.foreach { case (a, b, h) => assert(h == java.lang.Long.bitCount(a ^ b)) }
  }

  test("minhash signature: identical texts agree fully, disjoint texts don't") {
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "one two three four five six seven eight"
    val df = Seq(a, a, b).toDF("t")
      .select(minhashSignature(shingles(col("t"), 2), 16).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    val agree = sigs(0).zip(sigs(2)).count { case (x, y) => x == y }
    assert(agree <= 4, s"disjoint texts agree on $agree/16 positions")
  }

  test("qualityScore stays within [0,1] over generated corpus") {
    val got = corpus.toDF("t").select(qualityScore(col("t"))).as[Double].collect()
    got.foreach(q => assert(q >= 0.0 && q <= 1.0))
  }

  test("editDistancePairs equals brute force on a generated corpus") {
    // random short strings over a tiny alphabet → plenty of near pairs
    val genS: Gen[String] =
      Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val strs = Gen.listOfN(80, genS).apply(Gen.Parameters.default, Seed(7L)).get
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "text")
      .withColumn("blk", lit("all"))
    val maxDist = 3
    val got = graft.dedup.Dedup.editDistancePairs(
        df, "id", "text", Seq("blk"), prefixLen = 32, maxDist = maxDist)
      .as[(Long, Long, Long)].collect().toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // the operator normalizes whitespace; these strings have none, so the
    // brute force runs on raw strings
    val want = (for {
      i <- strs.indices; j <- strs.indices if i < j
      d = lev(strs(i), strs(j)) if d <= maxDist
    } yield (i.toLong, j.toLong, d.toLong)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("batchSessions equals the stateful sessionizer on generated event times") {
    import graft.streaming.Sessionize
    val genEv: Gen[(Long, Long)] = for {
      u <- Gen.chooseNum(1L, 8L)
      t <- Gen.chooseNum(0L, 2000L)
    } yield (u, t * 100) // coarse grid → gap boundary cases occur
    val evs = Gen.listOfN(300, genEv).apply(Gen.Parameters.default, Seed(11L)).get
      .distinct // duplicate (user, ts) rows have no defined session count
    val gap = 5000L
    val stateful = Sessionize.sessions(
        evs.map { case (u, t) => Sessionize.Event(u, t, "e") }.toDS(), gap)
      .collect().map(s => (s.userId, s.startMs, s.endMs, s.nEvents.toLong)).sorted.toSeq
    val declarative = Sessionize.batchSessions(
        evs.toDF("userId", "tsMs"), "userId", "tsMs", gap)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(declarative == stateful && declarative.nonEmpty)
  }

  test("native as-of join equals the window composition on generated streams") {
    import org.apache.spark.sql.expressions.Window
    val genE: Gen[(Long, Long, Long)] = for {
      u <- Gen.chooseNum(1L, 12L)   // few keys → dense time collisions
      t <- Gen.chooseNum(0L, 40L)   // narrow range → frequent exact ties
      id <- Gen.chooseNum(0L, 9999L)
    } yield (u, t, id)
    val raw = Gen.listOfN(400, genE).apply(Gen.Parameters.default, Seed(99L)).get
      .groupBy(_._3).map(_._2.head).toSeq // unique ids
    val (probes, refs) = raw.partition(_._3 % 2 == 0)
    val pDf = probes.toDF("user_id", "t", "event_id")
    val rDf = refs.toDF("user_id", "t", "event_id")

    val native = graft.plans.AsOf
      .joinBackward(pDf, rDf, "user_id", "t", "t", "event_id")
      .select(col("event_id"), col("event_id_r"))
      .as[(Long, Option[Long])].collect().toMap

    // window form: union both sides, carry the last ref id forward
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("is_probe"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val composed = pDf.select(col("user_id"), col("t"), col("event_id"),
        lit(1).as("is_probe"), lit(null).cast("long").as("rid"))
      .unionByName(rDf.select(col("user_id"), col("t"), col("event_id"),
        lit(0).as("is_probe"), col("event_id").as("rid")))
      .withColumn("asof", last(col("rid"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .select(col("event_id"), col("asof"))
      .as[(Long, Option[Long])].collect().toMap

    assert(native.size == probes.size)
    assert(native == composed)
  }

  test("HeavyHitters.exact equals brute force on generated Zipf-ish streams") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val genK: Gen[Long] = Gen.frequency(
        (6, Gen.chooseNum(1L, 4L)),      // few hot keys
        (4, Gen.chooseNum(100L, 900L)))  // long tail
      val data = Gen.listOfN(1500, genK).apply(Gen.Parameters.default, Seed(seed)).get
      val phi = 0.05
      val got = graft.ops.HeavyHitters.exact(data.toDF("key"), "key", phi)
        .as[(Long, Long)].collect().toMap
      val want = data.groupBy(identity).view.mapValues(_.size.toLong)
        .filter(_._2 > phi * data.size).toMap
      assert(got == want, s"seed=$seed: $got != $want")
      assert(want.nonEmpty, s"seed=$seed generated no heavy keys")
    }
  }

  test("graph loops match driver references on a generated random graph") {
    val genE: Gen[(Long, Long)] = for {
      a <- Gen.chooseNum(1L, 40L)
      b <- Gen.chooseNum(1L, 40L) if a != b
    } yield (a, b)
    val rawEdges = Gen.listOfN(70, genE).apply(Gen.Parameters.default, Seed(7L))
      .get.distinct
    val nodeIds = (1L to 40L).toSeq
    val und = rawEdges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      .withDefaultValue(Set.empty[Long])

    // reference components: repeated min-label to fixpoint
    var lbl = nodeIds.map(n => n -> n).toMap
    var changed = true
    while (changed) {
      changed = false
      nodeIds.foreach { n =>
        val m = (adj(n).map(lbl) + lbl(n)).min
        if (m != lbl(n)) { lbl += n -> m; changed = true }
      }
    }
    val gotCc = graft.graph.Graph
      .connectedComponents(nodeIds.toDF("id"), rawEdges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(gotCc == lbl)

    // reference BFS from seeds {1, 2} along DIRECTED edges, cap 3
    val out = rawEdges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      .withDefaultValue(Seq.empty[Long])
    var dist = Map(1L -> 0L, 2L -> 0L)
    var frontier = Set(1L, 2L)
    for (h <- 1L to 3L) {
      val next = frontier.flatMap(out(_)).filterNot(dist.contains)
      dist ++= next.map(_ -> h)
      frontier = next
    }
    val gotBfs = graft.graph.Graph
      .hopDistance(Seq(1L, 2L).toDF("id"), rawEdges.toDF("src", "dst"), 3)
      .as[(Long, Long)].collect().toMap
    assert(gotBfs == dist)

    // reference k-core: driver-side peel; check set AND in-core degrees
    val k = 3
    var live = und.flatMap(t => Seq(t._1, t._2)).toSet
    var stable = false
    while (!stable) {
      val deg = live.map(n => n -> adj(n).count(live)).toMap
      val next = live.filter(deg(_) >= k)
      stable = next == live
      live = next
    }
    val gotCore = graft.graph.Graph.kCore(rawEdges.toDF("src", "dst"), k)
      .as[(Long, Long)].collect().toMap
    assert(gotCore.keySet == live)
    gotCore.foreach { case (n, d) => assert(d == adj(n).count(live).toLong) }
  }

  test("Cdc.latestSnapshot equals the window row_number form on generated changes") {
    import org.apache.spark.sql.expressions.Window
    val genC: Gen[(Long, Long, Long)] = for {
      k <- Gen.chooseNum(1L, 20L)
      v <- Gen.chooseNum(1L, 50L)
      p <- Gen.chooseNum(0L, 999L)
    } yield (k, v, p)
    val raw = Gen.listOfN(200, genC).apply(Gen.Parameters.default, Seed(13L)).get
    // make (key, ver) unique so "latest" is well-defined without a seq col
    val changes = raw.groupBy(c => (c._1, c._2)).map(_._2.head).toSeq
      .toDF("key", "ver", "payload")
    val got = graft.ops.Cdc.latestSnapshot(changes, Seq("key"), Seq("ver"), Seq("payload"))
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val w = Window.partitionBy(col("key")).orderBy(col("ver").desc)
    val want = changes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("key", "ver", "payload").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("winnowing guarantee on generated docs: shared >= w+k-1 run => shared fingerprint") {
    // random alphanumeric docs, half of them seeded with a common long run
    val run = "thequickbrownfoxjumpsoverthelazydog" // 35 chars >= k+w-1 = 12+8-1
    val genDoc: Gen[String] = for {
      n <- Gen.chooseNum(20, 120)
      cs <- Gen.listOfN(n, Gen.alphaNumChar)
    } yield cs.mkString
    val base = Gen.listOfN(40, genDoc).apply(Gen.Parameters.default, Seed(7L)).get
    val docs = base.zipWithIndex.map { case (t, i) =>
      // even ids: splice the shared run into the middle
      if (i % 2 == 0) (i.toLong, t.take(t.length / 2) + run + t.drop(t.length / 2))
      else (i.toLong, t)
    }
    val fps = graft.ops.Winnow
      .fingerprints(docs.toDF("doc_id", "text"), "doc_id", "text", k = 8, w = 5)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap
    val seeded = docs.collect { case (id, _) if id % 2 == 0 => id }
    // every seeded pair shares at least one fingerprint (paper §3 guarantee)
    for (a <- seeded; b <- seeded if a < b)
      assert((fps(a) & fps(b)).nonEmpty, s"guarantee broken for pair ($a,$b)")
  }

  test("snapshotDiff algebra on generated snapshots: self-diff empty, classes partition the key space") {
    val genRow: Gen[(Long, Double)] = for {
      k <- Gen.chooseNum(1L, 30L)
      v <- Gen.chooseNum(0, 5).map(_.toDouble)
    } yield (k, v)
    def snap(seed: Long) = Gen.listOfN(40, genRow)
      .apply(Gen.Parameters.default, Seed(seed)).get
      .groupBy(_._1).map(_._2.head).toSeq // one row per key
    val a = snap(1L); val b = snap(2L)
    val aDf = a.toDF("key", "v"); val bDf = b.toDF("key", "v")
    assert(graft.ops.Cdc.snapshotDiff(aDf, aDf, Seq("key"), Seq("v")).count() == 0)
    val diff = graft.ops.Cdc.snapshotDiff(aDf, bDf, Seq("key"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val (am, bm) = (a.toMap, b.toMap)
    (am.keySet ++ bm.keySet).foreach { k =>
      val want = (am.get(k), bm.get(k)) match {
        case (None, Some(_)) => Some("added")
        case (Some(_), None) => Some("removed")
        case (Some(x), Some(y)) if x != y => Some("changed")
        case _ => None
      }
      assert(diff.get(k) == want, s"key $k")
    }
  }

  test("logregStep matches a driver-side reference on a generated batch") {
    // generated feature rows vs the straightforward Scala gradient
    val gen = Gen.listOfN(80, for {
      y <- Gen.oneOf(0.0, 1.0)
      x1 <- Gen.chooseNum(-3.0, 3.0)
      x2 <- Gen.chooseNum(-2.0, 2.0)
    } yield (y, x1, x2))
    val rows = gen.apply(Gen.Parameters.default, Seed(7L)).get
    val w0 = Seq(0.3, -0.2, 0.1)
    val eta = 0.1
    // reference: mean gradient of the log-loss at w0
    def sigma(z: Double) = 1.0 / (1.0 + math.exp(-z))
    val grads = rows.map { case (y, x1, x2) =>
      val p = sigma(w0(0) * 1.0 + w0(1) * x1 + w0(2) * x2)
      Seq((p - y) * 1.0, (p - y) * x1, (p - y) * x2)
    }.transpose.map(_.sum / rows.size)
    def fl4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val out = graft.ops.Curation.logregStep(
        rows.toDF("y", "x1", "x2"),
        features = Seq(lit(1.0), col("x1"), col("x2")),
        label = col("y") === 1.0, w0 = w0, eta = eta)
      .orderBy("feature").collect()
    out.zipWithIndex.foreach { case (r, j) =>
      assert(r.getAs[Double]("grad") == fl4(grads(j)), s"grad $j")
      assert(r.getAs[Double]("w_new") == fl4(w0(j) - eta * grads(j)), s"w $j")
    }
  }

  test("mixtureWeights: alphas are a probability vector, invariant to row order") {
    val gen = Gen.listOfN(90, for {
      d <- Gen.oneOf("a", "b", "c", "d")
      l <- Gen.chooseNum(0.5, 5.0)
    } yield (d, l))
    val rows = gen.apply(Gen.Parameters.default, Seed(11L)).get
    def run(xs: Seq[(String, Double)]) =
      graft.ops.Curation.mixtureWeights(
          xs.toDF("domain", "l"), "domain", col("l"), eta = 2.0, smooth = 0.1)
        .collect().map(r => r.getAs[String]("domain") ->
          (r.getAs[Double]("alpha"), r.getAs[Double]("excess"))).toMap
    val m1 = run(rows)
    val m2 = run(scala.util.Random.javaRandomToRandom(
      new java.util.Random(3)).shuffle(rows))
    assert(m1 == m2) // shuffle-invariant (partial aggs, 4-dec quantized)
    val alphas = m1.values.map(_._1)
    assert(math.abs(alphas.sum - 1.0) < 1e-2)
    assert(alphas.forall(a => a > 0.0 && a < 1.0))
  }
}
