package graft.examples

import graft.dedup.Dedup
import graft.sim.Ann
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding index-budget planning — the round-13 evaluators composed the
  * way a team sizes a vector corpus before committing 100 TB of it to an
  * index build:
  *
  *   1. CLEAN: SemDeDup-prune near-identical vectors within k-means cells
  *      (`Dedup.semDedup`, nlist sized ∝ corpus by the caller), then
  *      screen the survivors against the benchmark/eval set
  *      (`Dedup.semanticDecontaminate`) so test items never enter the
  *      index as retrieval targets.
  *   2. WIDTH: Matryoshka truncation-recall table (`Ann.mrlRecall`) over
  *      candidate prefix widths; pick the NARROWEST width whose top-k
  *      recall clears the caller's floor — every halving of width halves
  *      index bytes and roughly doubles scan throughput.
  *   3. BITS: sign-bit recall (`Ann.hammingRecall`, packed form) decides
  *      whether a 1-bit first-pass rescore tier is viable at 32× memory
  *      reduction, or the pipeline stays int8/float.
  *
  * Every stage is the oracle-checked registry operator run at its
  * production parameters; the report is driver-sized (a handful of
  * scalars per decision).
  */
object EmbeddingOpsExample {

  final case class WidthRow(width: Int, recall: Double)
  final case class Report(
      nInput: Long,
      nAfterSemDedup: Long,
      nContaminated: Long,
      nIndexable: Long,
      widthTable: Seq[WidthRow],
      chosenWidth: Option[Int],
      hammingRecall: Double,
      oneBitTierViable: Boolean)

  /** @param recallFloor   minimum acceptable truncation recall@k
    * @param hammingFloor  minimum 1-bit recall@k for the rescore tier
    * @param nlist         SemDeDup cell count — size ∝ corpus (PLANS.md
    *                      sizing table; pinning it makes the prune
    *                      quadratic-per-cell at scale) */
  def run(
      spark: SparkSession,
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      widths: Seq[Int],
      k: Int = 10,
      recallFloor: Double = 0.9,
      hammingFloor: Double = 0.5,
      nlist: Int = 16,
      dedupThreshold: Double = 0.25,
      contaminationThreshold: Double = 0.3): (DataFrame, Report) = {
    val nInput = corpus.count()

    // 1a. semantic dedup: within-cell cosine prune, keep-min-id
    val surviving = Dedup.semDedup(corpus, idCol, vecCol, nlist, dedupThreshold)
      .select(col("id").as(idCol))
      .join(corpus, Seq(idCol))
      .localCheckpoint(true)
    val nDeduped = surviving.count()

    // 1b. benchmark decontamination over the survivors
    val screened = Dedup.semanticDecontaminate(
        surviving, bench, idCol, vecCol, contaminationThreshold)
      .withColumnRenamed("vec_id", idCol)
    val indexable = surviving.join(
      screened.filter(!col("contaminated")).select(col(idCol)), Seq(idCol))
    val nContaminated = nDeduped - indexable.count()

    // 2. width decision from the truncation-recall table on the indexable
    // set (probe rule ≡1 mod 50, NOT ≡0: the benchmark slice is typically
    // a multiple-of-something id set and ≡0 rules can intersect it away)
    val probes = indexable.filter(pmod(col(idCol), lit(50)) === 1)
    val widthTable = Ann.mrlRecall(indexable, probes, idCol, vecCol, widths, k)
      .orderBy("d_trunc").collect()
      .map(r => WidthRow(r.getAs[Long]("d_trunc").toInt,
        r.getAs[Double]("recall"))).toSeq
    val chosen = widthTable.find(_.recall >= recallFloor).map(_.width)

    // 3. 1-bit tier decision (packed production form)
    val hamming = Ann.hammingRecall(indexable, probes, idCol, vecCol, k,
        packedDims = Some(dims))
      .collect().head.getAs[Double]("recall")

    val report = Report(
      nInput = nInput,
      nAfterSemDedup = nDeduped,
      nContaminated = nContaminated,
      nIndexable = nDeduped - nContaminated,
      widthTable = widthTable,
      chosenWidth = chosen,
      hammingRecall = hamming,
      oneBitTierViable = hamming >= hammingFloor)
    (indexable, report)
  }
}
