package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** From-scratch reference BPE (Sennrich et al. 2016) on a word-freq
    * map: same </w> marker, same left-to-right non-overlapping merge,
    * same (count desc, left, right) tiebreak. */
  private def referenceBpe(
      corpus: Seq[String], nMerges: Int): List[(String, String, Long)] = {
    var words: Map[List[String], Long] = corpus
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toList :+ "</w>") -> ws.size.toLong
      }
    var merges = List.empty[(String, String, Long)]
    var rounds = 0
    while (rounds < nMerges) {
      val counts = words.toSeq.flatMap { case (ps, f) =>
        ps.zip(ps.tail).map(p => p -> f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (counts.isEmpty) rounds = nMerges
      else {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges :+= ((a, b, c))
        words = words.map { case (ps, f) =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < ps.length) {
            if (i + 1 < ps.length && ps(i) == a && ps(i + 1) == b) { out += a + b; i += 2 }
            else { out += ps(i); i += 1 }
          }
          out.toList -> f
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap // merged segs can collide
        rounds += 1
      }
    }
    merges
  }

  test("train matches the reference merge sequence on the classic corpus") {
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = corpus.map(Tuple1.apply).toDF("text")
    val (got, finalWords) = Bpe.train(df, "text", nMerges = 8)
    val want = referenceBpe(corpus, 8)
    assert(got.map(m => (m.left, m.right, m.freq)) == want)
    // classic result: "es", "est", "est</w>" arise early (freq 9)
    assert(got.take(3).map(m => m.left + m.right) == Seq("es", "est", "est</w>"))
    // final segmentations contain the learned units
    val pieces = finalWords.select(col("w"), col("pieces"))
      .as[(String, Seq[String])].collect().toMap
    assert(pieces("newest").contains("est</w>") || pieces("newest") == Seq("newest</w>"))
  }

  test("applyMerges replays training merges and agrees with the trained word table") {
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = corpus.map(Tuple1.apply).toDF("text")
    val (merges, finalWords) = Bpe.train(df, "text", nMerges = 8)
    val trained = finalWords.select(col("w"), col("pieces"))
      .as[(String, Seq[String])].collect().toMap
    val applied = Bpe.applyMerges(
        Seq((1L, "low lower newest widest")).toDF("id", "text"), "id", "text", merges)
      .select(col("word"), col("pieces"))
      .as[(String, Seq[String])].collect().toMap
    assert(applied == trained)
  }

  test("train is deterministic across runs") {
    val df = Tables(spark, sf).documents.limit(50)
    val (m1, _) = Bpe.train(df, "text", nMerges = 4)
    val (m2, _) = Bpe.train(df, "text", nMerges = 4)
    assert(m1 == m2 && m1.size == 4)
  }
}
