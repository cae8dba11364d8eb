package graft

import graft.examples.EmbeddingOpsExample
import org.apache.spark.sql.functions._

/** Coherence of the embedding index-budget planning pipeline: each stage's
  * counts reconcile, the width decision is the minimal clearing width, and
  * the output set is exactly the clean survivors. */
class EmbeddingOpsExampleSpec extends SparkSpec {

  test("embedding ops pipeline: counts reconcile and decisions follow the tables") {
    val emb = Tables(spark, sf).embeddings
    val corpus = emb.filter(col("vec_id") % 25 =!= 0)
    val bench = emb.filter(col("vec_id") % 25 === 0)
    val (indexable, r) = EmbeddingOpsExample.run(
      spark, corpus, bench, "vec_id", "embedding",
      dims = 64, widths = Seq(16, 32, 64), k = 5,
      recallFloor = 0.8, hammingFloor = 0.3)

    assert(r.nInput == corpus.count())
    assert(r.nAfterSemDedup <= r.nInput && r.nAfterSemDedup > 0)
    assert(r.nIndexable == r.nAfterSemDedup - r.nContaminated)
    assert(indexable.count() == r.nIndexable)

    // width table: full width must read 1.0, so a floor <= 1 always chooses
    val byWidth = r.widthTable.map(w => w.width -> w.recall).toMap
    assert(byWidth(64) == 1.0)
    assert(r.chosenWidth.nonEmpty)
    // minimality: every narrower width in the table is below the floor
    val chosen = r.chosenWidth.get
    assert(byWidth(chosen) >= 0.8)
    assert(r.widthTable.filter(_.width < chosen).forall(_.recall < 0.8))

    // 1-bit verdict consistent with its own measurement
    assert(r.oneBitTierViable == (r.hammingRecall >= 0.3))
    assert(r.hammingRecall > 0.0 && r.hammingRecall <= 1.0)

    // determinism: a second run returns the identical report
    val (_, r2) = EmbeddingOpsExample.run(
      spark, corpus, bench, "vec_id", "embedding",
      dims = 64, widths = Seq(16, 32, 64), k = 5,
      recallFloor = 0.8, hammingFloor = 0.3)
    assert(r == r2)
  }
}
