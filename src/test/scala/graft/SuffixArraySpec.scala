package graft

import graft.ops.SuffixArrays

class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(texts: (Long, String)*): Map[(Long, Long), Long] =
    SuffixArrays
      .suffixRanks(texts.toDF("id", "t"), "id", "t", cap = 256)
      .as[(Long, Long, Long)].collect()
      .map { case (id, pos, r) => (id, pos) -> r }.toMap

  test("banana: the textbook suffix array") {
    // suffixes sorted: a(6) ana(4) anana(2) banana(1) na(5) nana(3)
    val got = ranksOf(1L -> "banana")
    assert(got == Map(
      (1L, 1L) -> 4L, (1L, 2L) -> 3L, (1L, 3L) -> 6L,
      (1L, 4L) -> 2L, (1L, 5L) -> 5L, (1L, 6L) -> 1L))
  }

  test("periodic text: sentinel ranks shorter suffixes first") {
    // "aaaa": every comparison ties until one side runs out — the
    // prefix-doubling sentinel must sort a < aa < aaa < aaaa
    val got = ranksOf(7L -> "aaaa")
    assert(got == Map(
      (7L, 1L) -> 4L, (7L, 2L) -> 3L, (7L, 3L) -> 2L, (7L, 4L) -> 1L))
  }

  test("multiple docs rank independently; ranks are a permutation") {
    val got = SuffixArrays.suffixRanks(
      Seq((1L, "mississippi"), (2L, "abab")).toDF("id", "t"), "id", "t", 64)
      .as[(Long, Long, Long)].collect()
    val byDoc = got.groupBy(_._1)
    assert(byDoc(1L).map(_._3).sorted.toSeq == (1L to 11L))
    assert(byDoc(2L).map(_._3).sorted.toSeq == (1L to 4L))
    // abab: suffixes sorted ab(3) abab(1) b(4) bab(2)
    val abab = byDoc(2L).map(t => t._2 -> t._3).toMap
    assert(abab == Map(1L -> 2L, 2L -> 4L, 3L -> 1L, 4L -> 3L))
    // mississippi spot-check against a driver-side sort of suffixes
    val suf = (1 to 11).map(p => p.toLong -> "mississippi".substring(p - 1))
    val want = suf.sortBy(_._2).zipWithIndex
      .map { case ((p, _), i) => p -> (i + 1).toLong }.toMap
    assert(byDoc(1L).map(t => t._2 -> t._3).toMap == want)
  }

  test("lcp_at: in-place suffix compare, bounds clamp to 0") {
    import org.apache.spark.sql.functions.col
    val df = Seq(("banana", 2L, 4L), ("banana", 1L, 1L), ("banana", 0L, 3L),
      ("banana", 3L, 99L), ("aaaa", 1L, 3L)).toDF("t", "a", "b")
    val got = df.select(
      col("t"), col("a"), col("b"),
      graft.plans.TextNative.lcpAt(col("t"), col("a"), col("b")).as("l"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("banana", 2L, 4L, 3L),  // "anana" vs "ana" share "ana"
      ("banana", 1L, 1L, 6L),  // whole string vs itself
      ("banana", 0L, 3L, 0L),  // position below range
      ("banana", 3L, 99L, 0L), // position past end
      ("aaaa", 1L, 3L, 2L)))   // "aaaa" vs "aa" → bounded by shorter
  }

  test("longest repeated substring: max LCP of rank-adjacent suffixes") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // "abcabcab": longest repeated substring is "abcab" (len 5)
    val docs = Seq((1L, "abcabcab")).toDF("id", "t")
    val ranks = SuffixArrays.suffixRanks(docs, "id", "t", cap = 64)
    val got = ranks
      .withColumn("prev_pos", lag(col("pos"), 1)
        .over(Window.partitionBy("id").orderBy("sa_rank")))
      .filter(col("prev_pos").isNotNull)
      .join(docs, "id")
      .select(graft.plans.TextNative.lcpAt(col("t"), col("prev_pos"), col("pos")).as("l"))
      .agg(max(col("l"))).as[Long].head()
    assert(got == 5L)
  }

  test("globalSuffixRanks: one total order across docs, ties by (id, pos)") {
    // suffixes of banana∪ana interleave globally; identical suffixes
    // ("a", "ana", "na") tie and must resolve doc 1 before doc 2
    val got = SuffixArrays.globalSuffixRanks(
      Seq((1L, "banana"), (2L, "ana")).toDF("id", "t"), "id", "t", cap = 64)
      .as[(Long, Long, Long)].collect()
      .map { case (id, pos, r) => (id, pos) -> r }.toMap
    // driver-side reference: sort (suffix, id, pos)
    val suf = (1 to 6).map(p => (1L, p.toLong, "banana".substring(p - 1))) ++
      (1 to 3).map(p => (2L, p.toLong, "ana".substring(p - 1)))
    val want = suf.sortBy(t => (t._3, t._1, t._2)).zipWithIndex
      .map { case ((id, p, _), i) => (id, p) -> (i + 1).toLong }.toMap
    assert(got == want)
    // sanity on the known interleave: a(1,6) < a(2,3) < ana(1,4) <
    // ana(2,1) < anana(1,2) < banana(1,1) < na(1,5) < na(2,2) < nana(1,3)
    assert(got((1L, 6L)) == 1L && got((2L, 3L)) == 2L)
    assert(got((1L, 4L)) == 3L && got((2L, 1L)) == 4L)
    assert(got((1L, 1L)) == 6L && got((1L, 3L)) == 9L)
  }

  test("globalSuffixRanks agrees with per-doc ranks on rank ORDER within a doc") {
    import org.apache.spark.sql.functions.col
    val docs = Seq((1L, "mississippi"), (2L, "abracadabra")).toDF("id", "t")
    val per = SuffixArrays.suffixRanks(docs, "id", "t", 64)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    val glob = SuffixArrays.globalSuffixRanks(docs, "id", "t", 64)
      .as[(Long, Long, Long)].collect().map(t => (t._1, t._2) -> t._3).toMap
    // restricting the global order to one doc must reproduce the
    // per-doc order exactly
    for (id <- Seq(1L, 2L)) {
      val ps = per.keys.filter(_._1 == id).map(_._2).toSeq.sorted
      val perOrder = ps.sortBy(p => per((id, p)))
      val globOrder = ps.sortBy(p => glob((id, p)))
      assert(perOrder == globOrder, s"doc $id order diverged")
    }
  }

  test("lcp_pair: two-string prefix compare; cross-doc span via global SA") {
    import org.apache.spark.sql.functions._
    val got = Seq(("abcde", "abcxy"), ("", "abc"), ("same", "same"))
      .toDF("a", "b")
      .select(graft.plans.TextNative.lcpPair(col("a"), col("b")).as("l"))
      .as[Long].collect().toSeq
    assert(got == Seq(3L, 0L, 4L))
    // cross-doc: docs share the span "ababab" (len 6); doc 3 shares only
    // "ab" (len 2) with the others. Adjacent-pair max over the global SA
    // must find exactly these.
    val docs = Seq((1L, "xxabababyy"), (2L, "zzabababww"), (3L, "qqab"))
      .toDF("id", "t")
    val ranks = SuffixArrays.globalSuffixRanks(docs, "id", "t", 64)
    val adj = ranks.as("x")
      .join(ranks.as("y"), col("x.gsa_rank") + 1 === col("y.gsa_rank"))
      .filter(col("x.id") =!= col("y.id"))
      .join(docs.select(col("id").as("xi"), col("t").as("ta")), col("x.id") === col("xi"))
      .join(docs.select(col("id").as("yi"), col("t").as("tb")), col("y.id") === col("yi"))
      .select(col("x.id").as("ida"), col("y.id").as("idb"),
        graft.plans.TextNative.lcpPair(
          col("ta").substr(col("x.pos").cast("int"), lit(64)),
          col("tb").substr(col("y.pos").cast("int"), lit(64))).as("l"))
    val perDoc = adj.select(col("ida").as("d"), col("l"))
      .unionAll(adj.select(col("idb"), col("l")))
      .groupBy("d").agg(max("l").as("m"))
      .as[(Long, Long)].collect().toMap
    assert(perDoc(1L) == 6L && perDoc(2L) == 6L && perDoc(3L) == 2L)
  }

  test("jaro_winkler matches the textbook/DuckDB values exactly") {
    import org.apache.spark.sql.functions.col
    // expected values printed by DuckDB's jaro_winkler_similarity —
    // the oracle function q_fuzzy_match compares against
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),   // classic Winkler pair
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("abc", "abc", 1.0),
      ("abc", "xyz", 0.0),
      ("", "abc", 0.0),                            // empty → 0, not 1
      ("", "", 0.0),
      ("CRATE", "TRACE", 0.7333333333333334),      // no common prefix
      ("ab", "ax", 0.6666666666666666),            // jaro ≤ 0.7: NO boost
      ("ABCDEFGH", "ABCDXXXX", 0.6666666666666666),// prefix 4 but no boost
      ("prefixaaaa", "prefixbbbb", 0.8400000000000001), // prefix capped at 4
      ("aaaaaaaaaab", "aaaaaaaaaac", 0.9636363636363636))
    val got = cases.toDF("a", "b", "want")
      .select(col("want"),
        graft.plans.TextNative.jaroWinkler(col("a"), col("b")).as("got"))
      .as[(Double, Double)].collect()
    got.foreach { case (want, g) =>
      assert(g == want, s"jaro_winkler mismatch: got $g want $want")
    }
  }

  test("cap truncates before ranking; empty-after-truncate docs drop out") {
    val got = SuffixArrays.suffixRanks(
      Seq((1L, "abcabc"), (2L, "")).toDF("id", "t"), "id", "t", cap = 3)
      .as[(Long, Long, Long)].collect()
    assert(got.forall(_._1 == 1L), "empty doc must produce no rows")
    // "abc": suffixes sorted abc(1) bc(2) c(3)
    assert(got.map(t => t._2 -> t._3).toMap ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
