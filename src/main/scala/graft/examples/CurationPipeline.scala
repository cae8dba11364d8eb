package graft.examples

import graft.dedup.Dedup
import graft.functions.TextFunctions._
import graft.ops.Sampling
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The flagship training-data curation pipeline, end to end:
  *
  *   normalize → language filter → quality filter → exact dedup →
  *   near-dup dedup (MinHash-LSH candidates, cluster, keep cluster min) →
  *   reproducible sampling → curated corpus + per-stage accounting.
  *
  * Every stage is the library operator used elsewhere; nothing here is
  * bespoke. Scale shape: two shuffles total for dedup (hash groupBy +
  * LSH band join), everything else stays in the scan stage.
  */
object CurationPipeline {

  final case class Report(stage: String, rows: Long)

  def run(
      spark: SparkSession,
      docs: DataFrame, // (doc_id, text, lang?, …)
      minQuality: Double = 0.3,
      keepLangs: Seq[String] = Seq("en", "unk"),
      sampleNumerator: Int = 256): (DataFrame, Seq[Report]) = {

    val report = scala.collection.mutable.ArrayBuffer.empty[Report]
    def stage(name: String, df: DataFrame): DataFrame = {
      report += Report(name, df.count()); df
    }

    val input = stage("input", docs)

    val normalized = stage("normalized",
      input.withColumn("text", normalizeText(col("text")))
        .filter(length(col("text")) > 0))

    val langOk = stage("lang_filter",
      normalized
        .withColumn("lang_pred", langId(col("text"), defaultMarkers))
        .filter(col("lang_pred").isin(keepLangs: _*)))

    val qualityOk = stage("quality_filter",
      langOk.withColumn("quality", qualityScore(col("text")))
        .filter(col("quality") >= minQuality))

    // exact dedup: keep min doc_id per content hash
    val exactKeep = Dedup.exact(qualityOk, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val exactDeduped = stage("exact_dedup", qualityOk.join(exactKeep, "doc_id"))

    // near-dup: LSH candidates → connected components → keep cluster min
    val pairs = Dedup.minhashLsh(exactDeduped, "doc_id", "text")
      .filter(col("est_jaccard") >= 0.8)
    val clusters = Dedup.clusters(
      exactDeduped.select(col("doc_id").as("id")), pairs)
    val keepers = clusters.filter(col("id") === col("cluster")).select(col("id").as("doc_id"))
    val nearDeduped = stage("near_dedup", exactDeduped.join(keepers, "doc_id"))

    val sampled = stage("sampled",
      Sampling.hashSample(nearDeduped, "doc_id", sampleNumerator))

    (sampled, report.toSeq)
  }
}
