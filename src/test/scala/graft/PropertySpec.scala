package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style tests: ScalaCheck-generated corpora checked in one batch
  * against independent driver-side reference implementations. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

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
}
