package graft

import graft.examples.PretrainPipeline
import org.apache.spark.sql.functions._

class PretrainPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("pretrain pipeline: stages compose, filter monotonically, shuffle is seed-pure") {
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val emb = Tables(spark, sf).embeddings
    val (out, report) = PretrainPipeline.run(spark, docs, emb,
      minSourceQuality = 0.0, langRates = Map("en" -> 256))
    val byStage = report.map(r => r.stage -> r.rows).toMap
    assert(byStage("input") == docs.count())
    assert(byStage("line_dedup") <= byStage("input"))
    assert(byStage("dup_text_filter") <= byStage("line_dedup"))
    assert(byStage("domain_gate") <= byStage("dup_text_filter"))
    assert(byStage("sem_dedup") <= byStage("domain_gate"))
    assert(byStage("sem_dedup") > 0)
    assert(byStage("packed") == byStage("lang_rebalance"))

    // packing invariant: within a (shard, bin), token sums fit the capacity
    // (oversize docs are flagged, not silently split)
    val bad = out.filter(!col("oversize"))
      .groupBy(col("shard"), col("bin"))
      .agg(sum(col("n_tokens")).as("t"))
      .filter(col("t") > 512)
      .count()
    assert(bad == 0)

    // epoch shuffle is a pure function of (seed, key): same seed → same
    // order; a different seed produces a different permutation
    val order0 = out.orderBy("shard", "pos").select("doc_id").as[Long].collect().toSeq
    val (out2, _) = PretrainPipeline.run(spark, docs, emb,
      minSourceQuality = 0.0, langRates = Map("en" -> 256))
    assert(out2.orderBy("shard", "pos").select("doc_id").as[Long].collect().toSeq == order0)
    val (outB, _) = PretrainPipeline.run(spark, docs, emb,
      minSourceQuality = 0.0, langRates = Map("en" -> 256), epochSeed = "epoch-1")
    assert(outB.orderBy("shard", "pos").select("doc_id").as[Long].collect().toSeq != order0)
    assert(outB.select("doc_id").as[Long].collect().sorted.toSeq ==
      out.select("doc_id").as[Long].collect().sorted.toSeq) // same set, new order
  }
}
