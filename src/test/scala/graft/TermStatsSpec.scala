package graft

import graft.functions.TermStats
import org.apache.spark.sql.functions._

class TermStatsSpec extends SparkSpec {
  import spark.implicits._

  test("tfidfTopTerms: rare terms outrank frequent ones, ties break on term") {
    // "x" appears in 1 of 3 docs (high idf); "the" in all 3 (idf
    // ln(4/4)=0 → score 0 even with tf 2)
    val df = Seq(
      (1L, "the the x a"),
      (2L, "the a b"),
      (3L, "the b c")).toDF("id", "text")
    val out = TermStats.tfidfTopTerms(df, "id", "text", k = 2)
      .select("doc_id", "rank", "term", "score")
      .as[(Long, Long, String, Double)].collect()
      .sortBy(r => (r._1, r._2)).toList
    val ln2 = math.floor(math.log(2.0) * 10000 + 0.5) / 10000
    // doc 3: "c" (df 1, idf ln 2) outranks "b" (df 2, idf ln(4/3))
    assert(out.map(r => (r._1, r._2, r._3)) == List(
      (1L, 1L, "x"), (1L, 2L, "a"),
      (2L, 1L, "a"), (2L, 2L, "b"),
      (3L, 1L, "c"), (3L, 2L, "b")))
    assert(out.head._4 == ln2) // tf=1 · ln((3+1)/(1+1))
    // "the" never makes top-2 despite the highest tf anywhere
    assert(!out.exists(_._3 == "the"))
  }

  test("tfidfTopTerms: blank docs contribute nothing; k caps output") {
    val df = Seq((1L, "  "), (2L, "a b c d e")).toDF("id", "text")
    val out = TermStats.tfidfTopTerms(df, "id", "text", k = 3).collect()
    assert(out.forall(_.getAs[Long]("doc_id") == 2L) && out.length == 3)
  }

  test("pmiCollocations matches a naive reference; exclusive pair beats free mixers") {
    val texts = Seq(
      "new york a b a a b b",
      "b a new york b b a a",
      "a a b new york a b b")
    val df = texts.map(Tuple1.apply).toDF("text")
    val out = TermStats.pmiCollocations(df, "text", minCount = 1)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // naive reference over the same corpus — marginals and total on the
    // full pair multiset
    val pairs = texts.flatMap(t => t.split(" ").sliding(2).map(p => (p(0), p(1))))
    val c12 = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = pairs.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val c2 = pairs.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val n = pairs.size.toDouble
    val want = c12.map { case (k @ (w1, w2), c) =>
      k -> (c, math.floor(math.log(c * n / (c1(w1) * c2(w2))) * 10000 + 0.5) / 10000)
    }
    assert(out == want)
    // "new york" is exclusive (always adjacent) → outscores the free mixers
    assert(out(("new", "york"))._2 > out(("a", "b"))._2)
  }

  test("chi2Terms: class-exclusive term ranks first; shared terms filtered by association") {
    // "spam" appears in every ad doc and no news doc → perfectly
    // associated with ad; "the" is everywhere → fails the positive-
    // association filter for both classes (a/n_cls == b/n_other)
    val df = (1L to 6L).map { i =>
      if (i <= 3) (i, "ad", s"the spam buy offer$i")
      else (i, "news", s"the report fact item$i")
    }.toDF("doc_id", "source", "text")
    val out = TermStats.chi2Terms(df, "doc_id", "source", "text", k = 2, minDf = 1L)
      .select("cls", "rank", "term", "chi2")
      .as[(String, Long, String, Double)].collect()
      .sortBy(r => (r._1, r._2)).toList
    assert(out.map(r => (r._1, r._2, r._3)) == List(
      ("ad", 1L, "buy"), ("ad", 2L, "spam"),
      ("news", 1L, "fact"), ("news", 2L, "report")))
    // a=3,b=0,c=0,d=3 → χ² = 6·81/81 = 6 for the exclusive terms
    assert(out.map(_._4).forall(_ == 6.0))
    assert(!out.exists(_._3 == "the"))
  }

  test("chi2Terms: minDf floor drops rare terms") {
    val df = Seq(
      (1L, "a", "rare common"), (2L, "a", "common"),
      (3L, "b", "common other"), (4L, "b", "other")).toDF("doc_id", "source", "text")
    val out = TermStats.chi2Terms(df, "doc_id", "source", "text", k = 5, minDf = 2L)
      .select("term").as[String].collect().toSet
    assert(!out.contains("rare")) // df=1 < 2
  }

  test("hashFeatures: exact signed sums per md5 lane, token-less docs drop") {
    val df = Seq((1L, "w w z"), (2L, "  ")).toDF("doc_id", "text")
    val out = TermStats.hashFeatures(df, "doc_id", "text").collect()
    assert(out.length == 1 && out.head.getAs[Long]("doc_id") == 1L)
    // reference: bucket = first md5 hex char, sign = parity of second
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = Array.fill(16)(0L)
    for (t <- Seq("w", "w", "z")) {
      val h = md5hex(t)
      val b = Integer.parseInt(h.substring(0, 1), 16)
      val sg = if (Integer.parseInt(h.substring(1, 2), 16) % 2 == 0) 1L else -1L
      want(b) += sg
    }
    for (j <- 0 until 16)
      assert(out.head.getAs[Long](s"f$j") == want(j), s"lane $j")
  }

  test("pmiCollocations: single-token docs are ignored") {
    val df = Seq("only", "a b").map(Tuple1.apply).toDF("text")
    val out = TermStats.pmiCollocations(df, "text", minCount = 1)
      .as[(String, String, Long, Double)].collect().toList
    assert(out.map(r => (r._1, r._2, r._3)) == List(("a", "b", 1L)))
  }

  test("rakeKeywords: multi-word phrases outrank lone words; punctuation splits") {
    // RAKE's canonical effect: "deep learning" co-occurs (deg 2 each,
    // freq 1 → score 2+2=4) and beats standalone "systems" (score 1).
    // The comma is a phrase boundary exactly like a stopword.
    val df = Seq(
      (1L, "Deep learning of systems, deep learning"),
      (2L, "systems")).toDF("id", "text")
    val out = TermStats.rakeKeywords(df, "id", "text", k = 2)
      .as[(Long, String, Double, Long)].collect()
      .sortBy(r => (r._1, r._4)).toList
    // doc 1 phrases: "deep learning" ×2 (collapsed), "systems";
    // deep: deg 2+2=4 freq 2 → 2.0; learning likewise 2.0; systems:
    // deg 1+1=2 freq 2 → 1.0
    assert(out == List(
      (1L, "deep learning", 4.0, 1L), (1L, "systems", 1.0, 2L),
      (2L, "systems", 1.0, 1L)))
  }

  test("rakeKeywords: stopwords segment phrases and never appear in them") {
    val df = Seq((7L, "the red fox and a lazy dog")).toDF("id", "text")
    val out = TermStats.rakeKeywords(df, "id", "text", k = 5)
      .as[(Long, String, Double, Long)].collect().toList.sortBy(_._4)
    // two 2-word phrases, each word deg 2 freq 1 → score 4; tie on
    // phrase text: "lazy dog" < "red fox"
    assert(out == List(
      (7L, "lazy dog", 4.0, 1L), (7L, "red fox", 4.0, 2L)))
  }
}
