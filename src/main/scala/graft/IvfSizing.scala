package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sim.Ann

/** IVF production-sizing measurement (round 13) — converts the PLANS.md
  * claim "nlist ∝ corpus makes the IVF forms linear" from an assertion
  * into a measured point.
  *
  * The registry queries pin nlist=16 so the DuckDB oracle can enumerate
  * the same centroids; at that FIXED nlist the probed fraction
  * (nprobe/nlist) is constant, so IVF work grows ∝ anchors × corpus and
  * the sf1 slope reads ~16x at 10x data. Production sizing scales nlist
  * with the corpus (nlist ∝ n, nprobe fixed), shrinking each cell to
  * O(1) per-anchor candidates — total work ∝ anchors, i.e. linear.
  * This main measures the same two registry shapes at a caller-chosen
  * nlist, plus recall@10 of the knnJoinIvf path vs exact brute-force on
  * a probe sample, so the sizing point carries BOTH halves of the claim:
  * runtime flat AND recall held.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.IvfSizing <nlist> [nprobe]
  * Emits one JSON line; bench-only (no oracle — the oracle-pinned forms
  * stay at nlist=16 in the registry).
  */
object IvfSizing {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf1")
    val nlist = if (args.nonEmpty) args(0).toInt else 160
    val nprobe = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    GraftSession.install(spark)
    spark.sparkContext.setLogLevel("WARN")

    def med3(body: => Long): Double = {
      body // warm: JIT + codegen + index build path
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.sorted
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      ts(1)
    }

    val emb = Tables(spark, sfDir).embeddings
    val nCorpus = emb.count()

    // shape 1: hard-negative mining (q_hard_negatives_ivf at this nlist)
    val tHn = med3 {
      val index = Ann.ivfBuild(emb, "vec_id", "embedding", nlist)
      Ann.hardNegativesIvf(
        emb.filter(col("vec_id") % 10 === 0), emb, index,
        "vec_id", "embedding", "label", nprobe = nprobe, k = 3).count()
    }

    // shape 2: kNN classification (q_knn_classify_ivf at this nlist)
    val tKc = med3 {
      val labeled = emb.filter(col("vec_id") % 5 === 0)
      val index = Ann.ivfBuild(labeled, "vec_id", "embedding", nlist)
      Ann.knnClassifyIvf(
        emb.filter(col("vec_id") % 5 =!= 0), labeled, index,
        "vec_id", "embedding", "label", nprobe = nprobe, k = 5).count()
    }

    // shape 3: SemDeDup (q_semdedup at this nlist) — the other operator
    // whose linearity claim rests on nlist ∝ corpus (within-cluster pair
    // join is O(n²/nlist); the registry pins nlist=16 for the oracle)
    val tSd = med3 {
      graft.dedup.Dedup.semDedup(
        emb, "vec_id", "embedding", nlist = nlist, threshold = 0.25).count()
    }

    // assign-stage ceiling (round 16): flat argmin is n·nlist·dims; the
    // two-stage hierarchical assign (ivfBuildHier) is n·2√nlist·dims.
    // Timing BOTH builds at this nlist gives the measured crossover the
    // PLANS.md IVF section's "past-n^1.5 lever" row wants — plus the
    // agreement fraction, the exactness half of that trade.
    val tAssignFlat = med3 {
      Ann.ivfBuild(emb, "vec_id", "embedding", nlist).assigned.count()
    }
    val tAssignHier = med3 {
      Ann.ivfBuildHier(emb, "vec_id", "embedding", nlist).assigned.count()
    }
    val tAssignHierW1 = med3 {
      Ann.ivfBuildHier(emb, "vec_id", "embedding", nlist, wprobe = 1)
        .assigned.count()
    }
    val flatIdx = Ann.ivfBuild(emb, "vec_id", "embedding", nlist)
    val agree = Ann.ivfBuildHier(emb, "vec_id", "embedding", nlist).assigned
      .select(col("id"), col("cid").as("hcid"))
      .join(flatIdx.assigned.select(col("id"), col("cid")), "id")
      .agg((sum(when(col("hcid") === col("cid"), 1L).otherwise(0L))
        .cast("double") / count(lit(1))).as("agree"))
      .head().getDouble(0)

    // recall@10 vs exact brute-force on a probe sample (2% of corpus, the
    // q_ann_recall sampling): the quality half of the sizing claim
    val probes = emb.filter(col("vec_id") % 50 === 0)
    val index = Ann.ivfBuild(emb, "vec_id", "embedding", nlist)
    val exact = Ann.knnJoinExact(probes, emb, "vec_id", "embedding", k = 10)
      .select(col("probe_id"), col("id"))
    def recallOf(idx: Ann.IvfIndex): Double = {
      val approx = Ann.knnJoinIvf(probes, idx, "vec_id", "embedding",
          nprobe = nprobe, k = 10)
        .select(col("probe_id").as("p2"), col("id").as("id2"))
      exact.join(approx,
          col("probe_id") === col("p2") && col("id") === col("id2"), "left")
        .agg((count(col("id2")).cast("double") / count(lit(1))).as("recall"))
        .head().getDouble(0)
    }
    val rec = recallOf(index)
    // end-to-end quality through the HIER-assigned index: raw cid
    // agreement understates it (a boundary vector's wrong-but-adjacent
    // cell is usually still probed at nprobe > 1); w=1 vs the w=2
    // default prices the multi-probe remedy
    val recHier = recallOf(
      Ann.ivfBuildHier(emb, "vec_id", "embedding", nlist))
    val recHierW1 = recallOf(
      Ann.ivfBuildHier(emb, "vec_id", "embedding", nlist, wprobe = 1))

    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    println(
      s"""{"metric":"ivf_sizing","sf_dir":"$sfDir","n_corpus":$nCorpus,"nlist":$nlist,"nprobe":$nprobe,"hard_negatives_s":${fmt(tHn)},"knn_classify_s":${fmt(tKc)},"semdedup_s":${fmt(tSd)},"assign_flat_s":${fmt(tAssignFlat)},"assign_hier_s":${fmt(tAssignHier)},"assign_hier_w1_s":${fmt(tAssignHierW1)},"assign_agree":${fmt(agree)},"recall_at_10":${fmt(rec)},"recall_at_10_hier":${fmt(recHier)},"recall_at_10_hier_w1":${fmt(recHierW1)}}""")
    spark.stop()
  }
}
