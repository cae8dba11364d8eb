package graft.examples

import graft.dedup.Dedup
import graft.functions.TextFunctions._
import graft.ops.{Curation, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pretraining-corpus assembly, end to end — the round-3 operator set in
  * one pipeline, the CommonCrawl→training-shards shape:
  *
  *   Gopher structural gate → line-level dedup (C4) → exact-substring
  *   span removal (Lee et al.) → duplicated-text filter (Lee et al.
  *   profile) → domain-level quality gate (RefinedWeb) → semantic dedup
  *   over embeddings (SemDeDup) → language rebalance (stratified rates or
  *   temperature-scaled mix) → sequence packing → deterministic shard
  *   shuffle.
  *
  * Like [[CurationPipeline]] (the document-level flagship), every stage is
  * the library operator; this example exists to pin how they compose and
  * what each stage costs. Scale shape: line dedup and the dup-text profile
  * shuffle 8-byte hashes; the domain gate broadcasts per-source verdicts;
  * SemDeDup's pair join is cluster-blocked; packing and shard shuffle are
  * per-shard window work. No stage shuffles raw document text except line
  * dedup's keeper reassembly (one uniform doc-id shuffle).
  */
object PretrainPipeline {

  final case class Report(stage: String, rows: Long)

  def run(
      spark: SparkSession,
      docs: DataFrame, // (doc_id, text, lang, source, …)
      embeddings: DataFrame, // (vec_id, embedding) with vec_id = doc_id
      maxDupFrac: Double = 0.5,
      minSourceQuality: Double = 0.40,
      langRates: Map[String, Int] = Map.empty, // strata → keep numerator /256
      mixAlpha: Double = 0.7, // temperature when langRates is empty
      spanK: Int = 8, // duplicated-substring gram size
      seqCapacity: Long = 512,
      numShards: Int = 8,
      epochSeed: String = "epoch-0"): (DataFrame, Seq[Report]) = {

    val report = scala.collection.mutable.ArrayBuffer.empty[Report]
    def stage(name: String, df: DataFrame): DataFrame = {
      report += Report(name, df.count()); df
    }

    val input = stage("input", docs)

    // Gopher structural rules: drop documents failing the composite verdict
    val gated = stage("gopher_gate",
      input.select((col("*") +: gopherStats(col("text"), minWords = 5)): _*)
        .filter(col("gopher_pass") === 1)
        .select(input.columns.map(col): _*))

    // C4 line-level dedup: sentence "lines", global first-occurrence keep
    val lines = filter(split(col("text"), "\\.\\s+"), l => length(trim(l)) > 0)
    val lineDeduped = stage("line_dedup",
      gated.select(col("doc_id"), col("lang"), col("source"), lines.as("lines"))
        .transform(d => Dedup.lineDedup(d, "doc_id", col("lines"))
          .join(d.select(col("doc_id"), col("lang"), col("source")), "doc_id"))
        .withColumnRenamed("clean_text", "text")
        .filter(length(col("text")) > 0))

    // cut exact duplicated k-gram spans, keep the surviving text
    val spanCut = stage("span_dedup",
      Dedup.substringSpanDedup(lineDeduped, "doc_id", "text", k = spanK)
        .withColumnRenamed("clean_text", "text")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("text"))
        .join(lineDeduped.select(col("doc_id"), col("lang"), col("source")), "doc_id"))

    // drop documents that are mostly text duplicated elsewhere
    val profile = Dedup.duplicatedNgramProfile(spanCut, "doc_id", "text", n = 3)
      .select(col("id").as("doc_id"), col("dup_frac"))
    val dupFiltered = stage("dup_text_filter",
      spanCut.join(profile, "doc_id").filter(col("dup_frac") < maxDupFrac))

    // whole-source gate on mean quality
    val domainOk = stage("domain_gate",
      Curation.sourceQualityGate(
        dupFiltered, "source",
        floor(qualityScore(col("text")) * 10000 + lit(0.5)) / 10000,
        minMean = minSourceQuality, minDocs = 2))

    // semantic dedup on the embedding table, survivors join back
    val vecs = embeddings.join(
      domainOk.select(col("doc_id").as("vec_id")), "vec_id")
    val semKeep = Dedup.semDedup(vecs, "vec_id", "embedding",
        nlist = 16, threshold = 0.3)
      .select(col("id").as("doc_id"))
    val semDeduped = stage("sem_dedup", domainOk.join(semKeep, "doc_id"))

    // rebalance the language mix: explicit per-language rates when given,
    // otherwise temperature-scaled smoothing toward uniform
    val balanced = stage("lang_rebalance",
      if (langRates.isEmpty)
        Sampling.temperatureMix(semDeduped, "doc_id", "lang", mixAlpha)
          .drop("n_s", "rate")
      else Sampling.stratifiedSample(semDeduped, "doc_id", "lang",
        langRates, defaultRate = 256))

    // pack into fixed-token sequences per shard, then epoch-shuffle
    val withTokens = balanced
      .withColumn("n_tokens", tokenCount(col("text")))
      .withColumn("shard", pmod(xxhash64(col("doc_id")), lit(numShards)))
    // keep the packing shard under its own name: shardShuffle emits its
    // OWN epoch-shard column, which would otherwise silently replace it
    val packed = stage("packed",
      Sampling.packBins(withTokens, "n_tokens", seqCapacity, "shard", "doc_id"))
      .withColumnRenamed("shard", "pack_shard")
    val shuffled = Sampling.shardShuffle(packed, "doc_id", epochSeed, numShards)

    (shuffled, report.toSeq)
  }
}
