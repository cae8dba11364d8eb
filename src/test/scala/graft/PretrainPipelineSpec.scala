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
    assert(byStage("gopher_gate") <= byStage("input"))
    assert(byStage("gopher_gate") > 0)
    assert(byStage("line_dedup") <= byStage("gopher_gate"))
    assert(byStage("span_dedup") <= byStage("line_dedup"))
    assert(byStage("dup_text_filter") <= byStage("span_dedup"))
    assert(byStage("domain_gate") <= byStage("dup_text_filter"))
    assert(byStage("sem_dedup") <= byStage("domain_gate"))
    assert(byStage("sem_dedup") > 0)
    assert(byStage("packed") == byStage("lang_rebalance"))

    // packing invariant of contiguous fill: a bin's final doc may straddle
    // the boundary (docs are never split), but everything BEFORE the last
    // doc must fit the capacity — i.e. the bin was not already full when
    // its last doc started
    val bad = out
      .groupBy(col("pack_shard"), col("bin"))
      .agg((sum(col("n_tokens")) - max_by(col("n_tokens"), col("doc_id"))).as("before_last"))
      .filter(col("before_last") >= 512)
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
