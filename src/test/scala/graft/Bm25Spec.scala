package graft

import graft.sim.Bm25

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark join hash join broadcast"),
    (2L, "sort merge join on the cluster"),
    (3L, "hash hash hash table probe build"),
    (4L, "filter scan project nothing here"),
    (5L, "broadcast join hash partition shuffle"))

  /** Plain-Scala Okapi BM25 — an independent reference implementation. */
  private def refScores(
      docs: Seq[(Long, String)], query: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Map[Long, (Double, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    val n = docs.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    val df = query.map(q => q -> toks.values.count(_.contains(q))).toMap
    toks.flatMap { case (id, ts) =>
      val ws = query.flatMap { q =>
        val tf = ts.count(_ == q)
        if (tf == 0) None
        else {
          val idf = math.log((n - df(q) + 0.5) / (df(q) + 0.5) + 1.0)
          Some(idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * ts.size / avgdl)))
        }
      }
      if (ws.isEmpty) None else Some(id -> (ws.sum, ws.size.toLong))
    }
  }

  test("scores match an independent plain-Scala BM25 implementation") {
    val df = corpus.toDF("doc_id", "text")
    val query = Seq("hash", "join", "broadcast")
    val got = Bm25.scores(df, "doc_id", "text", query)
      .as[(Long, Double, Long)].collect()
      .map { case (id, s, nt) => id -> (s, nt) }.toMap
    val want = refScores(corpus, query)
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (s, nt)) =>
      assert(math.abs(s - want(id)._1) < 1e-9, s"doc $id: $s vs ${want(id)._1}")
      assert(nt == want(id)._2)
    }
  }

  test("search ranks by relevance with deterministic tiebreak") {
    val df = corpus.toDF("doc_id", "text")
    val top = Bm25.search(df, "doc_id", "text", Seq("hash", "join"), k = 3)
      .as[(Long, Double, Long)].collect()
    val want = refScores(corpus, Seq("hash", "join")).toSeq
      .sortBy { case (id, (s, _)) => (-s, id) }.take(3).map(_._1)
    assert(top.map(_._1).toSeq == want)
    // scores descend
    assert(top.map(_._2).toSeq == top.map(_._2).sortBy(-_).toSeq)
  }

  test("rarer terms score higher at equal tf/dl (IDF ordering)") {
    // 'rare' appears in 1 doc, 'common' in 4; target docs have identical
    // length and tf=1 for their term → the rare-term doc must win.
    val docs = Seq(
      (1L, "rare aaa bbb"), (2L, "common aaa bbb"),
      (3L, "common xxx yyy"), (4L, "common ppp qqq"), (5L, "common rrr sss"))
      .toDF("doc_id", "text")
    val s = Bm25.scores(docs, "doc_id", "text", Seq("rare", "common"))
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(s(1L) > s(2L))
  }

  test("postings is the (id, dl, term, tf) inverted index") {
    val df = corpus.take(2).toDF("doc_id", "text")
    val p = Bm25.postings(df, "doc_id", "text")
      .as[(Long, Long, String, Long)].collect().toSet
    assert(p.contains((1L, 5L, "join", 2L)))
    assert(p.contains((2L, 6L, "cluster", 1L)))
    assert(p.filter(_._1 == 1L).forall(_._2 == 5L))
  }
}
