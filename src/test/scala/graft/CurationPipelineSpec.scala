package graft

import graft.examples.CurationPipeline
import org.apache.spark.sql.functions._

class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("curation pipeline: stages monotonically filter; near-dups removed") {
    // corpus with a planted near-duplicate pair and an exact duplicate
    val docs = Tables(spark, sf).documents.limit(200)
      .select(col("doc_id"), col("text"))
    val planted = docs.unionByName(
      docs.filter(col("doc_id") === 0)
        .select((col("doc_id") + 5000).as("doc_id"), col("text"))) // exact dup
    val (out, report) = CurationPipeline.run(spark, planted,
      minQuality = 0.0, keepLangs = Seq("en", "unk", "fr", "de", "es"))
    val byStage = report.map(r => r.stage -> r.rows).toMap
    assert(byStage("input") == 201)
    assert(byStage("exact_dedup") == 200)  // planted exact dup removed
    assert(byStage("near_dedup") <= byStage("exact_dedup"))
    assert(byStage("sampled") == out.count())
    assert(out.count() > 0)
    // deterministic: same input → same curated set
    val (out2, _) = CurationPipeline.run(spark, planted,
      minQuality = 0.0, keepLangs = Seq("en", "unk", "fr", "de", "es"))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ==
      out2.select("doc_id").as[Long].collect().sorted.toSeq)
  }
}
