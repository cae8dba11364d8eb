package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (JASA 1969) — the
  * log-odds scoring layer on top of the repo's blocking/candidate ops
  * (sorted-neighborhood blocking, fuzzy match, LSH candidates): each
  * field comparison contributes an agreement weight
  * log(m/u) or disagreement weight log((1−m)/(1−u)) and the pair's
  * total log-odds decides match / possible / non-match against two
  * thresholds.
  *
  * Numeric contract: weights are INTEGER MILLI-BANS — the designer
  * computes log₂(m/u)·1000 once and passes rounded longs (the CUSUM
  * precedent: m/u probabilities are a-priori DESIGN constants, not data
  * estimates, so no float derivation exists at runtime). Scores are
  * exact BIGINT sums — order-free, partial-aggregatable, reproducible on
  * any engine; the display score divides by 1000 once.
  *
  * Scale shape: scoring is a pure scan-stage projection over the
  * caller's candidate-pair relation — the blocking choice upstream owns
  * the pair-count budget (never all-pairs), and nothing here shuffles.
  */
object Linkage {

  /** One field comparison: `agree` evaluated per pair row, weights in
    * milli-bans (log₂ odds × 1000, rounded at design time). */
  final case class FieldRule(agree: Column, wAgree: Long, wDisagree: Long)

  /** Score candidate pairs and classify. Adds `score_mb` (BIGINT
    * milli-bans), `score` (bans, double — one division), and `decision`
    * (`match` / `possible` / `non_match`). A NULL field comparison reads
    * as disagreement (missing data must not look like evidence). */
  def fellegiSunter(
      pairs: DataFrame, rules: Seq[FieldRule],
      matchFloor: Long, possibleFloor: Long): DataFrame = {
    require(rules.nonEmpty, "at least one field rule")
    require(matchFloor > possibleFloor,
      s"matchFloor $matchFloor must exceed possibleFloor $possibleFloor")
    val score = rules.map(r =>
      when(coalesce(r.agree, lit(false)), lit(r.wAgree))
        .otherwise(lit(r.wDisagree)))
      .reduce(_ + _)
    pairs
      .withColumn("score_mb", score.cast("long"))
      .withColumn("score", col("score_mb").cast("double") / 1000.0)
      .withColumn("decision",
        when(col("score_mb") >= matchFloor, lit("match"))
          .when(col("score_mb") >= possibleFloor, lit("possible"))
          .otherwise(lit("non_match")))
  }

  /** American Soundex phonetic code (Russell 1918; the classic blocking
    * key for name-based record linkage — "Robert"/"Rupert" → R163).
    * Simplified variant WITHOUT the H/W-transparency rule (the form most
    * SQL engines ship), defined exactly as:
    *
    *   1. strip non-letters, uppercase; empty → ''.
    *   2. map every letter to its class digit
    *      (B F P V→1, C G J K Q S X Z→2, D T→3, L→4, M N→5, R→6,
    *       vowels + H W Y→0) via one `translate`.
    *   3. collapse runs of the same digit (adjacent same-class letters
    *      code once — including the run containing the first letter).
    *   4. drop the first collapsed digit (the first letter represents
    *      itself), delete the 0 separators, keep 3 digits, right-pad
    *      with '0'.
    *
    * Pure scan-stage string ops (translate + 7 bounded regexp_replace),
    * deterministic and engine-portable — the oracle mirrors each step
    * textually. Blocking on the code is one groupBy/equi-join key. */
  def soundex(name: Column): Column = {
    val s = upper(regexp_replace(name, "[^A-Za-z]", ""))
    val m = translate(s,
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230120022455012623010202")
    val collapsed = (0 to 6).foldLeft(m)((acc, d) =>
      regexp_replace(acc, s"$d{2,}", s"$d"))
    val rest = regexp_replace(substring(collapsed, 2, 1000000), "0", "")
    when(length(s) === 0, lit(""))
      .otherwise(concat(substring(s, 1, 1), rpad(substring(rest, 1, 3), 3, "0")))
  }
}
