package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Script profiling + Luhn validation unit behavior. */
class TextProfileSpec extends SparkSpec {
  import spark.implicits._

  private def profile(texts: String*): Seq[(Seq[Long], String)] = {
    val counts = scriptClasses.map { case (n, r) =>
      n -> scriptCount(col("t"), r)
    }
    texts.toDF("t").select(
        array(counts.map(_._2): _*).as("c"),
        dominantScript(counts).as("d"))
      .as[(Seq[Long], String)].collect().toSeq
  }

  test("scriptCount/dominantScript: per-script counts and priority tiebreak") {
    val Seq((c1, d1), (c2, d2), (c3, d3), (c4, d4)) = profile(
      "hello мир",      // 5 latin, 3 cyrillic
      "αβγ 中文です",    // 3 greek, 4 cjk (2 han + 2 kana)
      "12345 !!",       // nothing scripted
      "ab ξδ")          // 2 latin vs 2 greek tie → priority: latin
    assert(c1(0) == 5 && c1(1) == 3 && d1 == "latin", s"$c1 $d1")
    assert(c2(2) == 3 && c2(3) == 4 && d2 == "cjk", s"$c2 $d2")
    assert(c3.forall(_ == 0) && d3 == "none")
    assert(c4(0) == 2 && c4(2) == 2 && d4 == "latin", "priority tiebreak")
  }

  test("scriptCount: accented latin counts as latin") {
    val Seq((c, d)) = profile("éàü café")
    assert(c(0) == 7 && d == "latin") // 3 accents + 'caf' + 'é'
  }

  test("soundex: classic codes, run collapse, vowel-leading names") {
    val cases = Seq(
      "Robert" -> "R163", "Rupert" -> "R163",   // the canonical pair
      "Tymczak" -> "T522",                       // vowel separators reset runs
      "Pfister" -> "P236",                       // adjacent same-class collapses (simplified variant)
      "Jackson" -> "J250",
      "Adam" -> "A350",                          // vowel first letter
      "BB" -> "B000", "Lee" -> "L000",
      "a!!" -> "A000", "123" -> "")              // stripped / empty
    val got = cases.map(_._1).toDF("s")
      .select(col("s"), graft.ops.Linkage.soundex(col("s")))
      .as[(String, String)].collect().toMap
    cases.foreach { case (s, want) =>
      assert(got(s) == want, s"soundex($s) = ${got(s)}, want $want")
    }
  }

  test("syllables: vowel runs with silent-e adjustment, floor 1") {
    val cases = Seq(
      "cat" -> 1, "table" -> 2,   // ends 'le' — e kept
      "move" -> 1,                // silent e dropped
      "idea" -> 2,                // 'i','ea' runs
      "rhythm" -> 1,              // y counts as vowel
      "e" -> 1, "tv" -> 1)        // floor at 1
    val got = cases.map(_._1).toDF("w")
      .select(col("w"), syllables(col("w"))).as[(String, Int)]
      .collect().toMap
    cases.foreach { case (w, want) =>
      assert(got(w) == want, s"syllables($w) = ${got(w)}, want $want")
    }
  }

  test("luhnValid: known PANs and near-misses") {
    val cases = Seq(
      "4111111111111111" -> true,  // classic Visa test number
      "4111111111111112" -> false, // off-by-one check digit
      "79927398713" -> true,       // the Luhn reference example
      "79927398714" -> false,
      "0000000000000" -> true)     // all zeros sums to 0
    val got = cases.map(_._1).toDF("s")
      .select(col("s"), luhnValid(col("s"))).as[(String, Boolean)]
      .collect().toMap
    cases.foreach { case (s, want) =>
      assert(got(s) == want, s"luhn($s)")
    }
  }
}
