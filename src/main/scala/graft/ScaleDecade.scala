package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-decade scale sweep (round 15) — the instrument the single-decade
  * [[ScaleBench]] cannot be: one 10× ratio per query cannot distinguish
  * linear from n·log n (or from fixed overhead amortizing), but TWO
  * consecutive decades can. Each headliner below runs at sf1 (10× the
  * anchored sf0.1) and sf10 (100×, `tools/gen_sf1.py <dst> 100`), and the
  * artifact carries both per-decade slopes:
  *
  *   slope1 = t(sf1) / anchor(sf0.1),   slope2 = t(sf10) / t(sf1)
  *
  * For a linear operator at fixed local[32] parallelism both slopes read
  * ~10× (usually slope2 > slope1, because sf1 still amortizes fixed
  * overhead that sf10 doesn't); n·log n reads ~10×/~12×; a quadratic
  * term reads slope2 ≫ slope1. The GATE, however, is the TOTAL
  * anchor→sf10 slope — `t(sf10) > 120 × anchor` with a 20 s absolute
  * floor — because a per-decade ratio line punishes exactly the entries
  * whose sf1 reading is fixed-overhead-bound and is hostage to sf1
  * ambient noise (measured: a contaminated window moved same-code sf1
  * readings 3×). 120× is stricter than the ScaleBench per-decade
  * convention compounded (12×·12× = 144×). Flagged entries self-settle
  * (GC + warm + min of 2) before the verdict; persistent flags get a
  * PLANS.md cause row. With NAMED query args the run becomes a
  * focused refresh: only those rows re-measure and replace their
  * entries in the existing artifact (marked `refreshed`), the rest
  * carry over — the settlement instrument for battery rows inflated by
  * a bad host window.
  *
  * The battery is the ~20 designed-linear HEADLINERS (scan/agg/join,
  * the dedup family, text curation, two graph fixpoints, sketches) plus
  * the two IVF shapes at PRODUCTION sizing — `nlist = 0` auto ⌈√n⌉
  * ([[graft.sim.Ann.ivfBuild]]), the committed sizing law, so the
  * linearity claim for the ANN tier is measured at BOTH decades rather
  * than asserted. Registry queries run exactly as registered (pinned
  * nlist=16 etc.); the auto-sized shapes are extra rows named
  * `ivf_knn_join_auto` / `semdedup_auto`.
  *
  * Usage: SPARK_GRAFT_SF1_DIR=target/sf1 SPARK_GRAFT_SF10_DIR=target/sf10
  *   runMain graft.ScaleDecade   → SCALE_DECADE.json
  *   (override out: SPARK_GRAFT_DECADE_OUT). Exit 1 on settled flags.
  */
object ScaleDecade {

  /** Shapes that are designed O(n^1.5), not linear — flag-exempt but
    * still recorded: the auto-sized IVF forms assign every vector
    * against ⌈√n⌉ centroids, so the ASSIGN step alone is n·√n·dims and
    * the theoretical decade slope is 10·√10 ≈ 31.6×. The first decade
    * measured 13.6×/17.8× — BETTER than the n^1.5 design line (the
    * probe/pair stages still dominate) — which is the evidence the
    * committed sizing law wants. True linearity at 100 TB needs a
    * hierarchical coarse quantizer (ANN-assign against the codebook),
    * which trades exactness of the cell boundary; out of scope per the
    * PLANS.md IVF sizing section. */
  val designedN15: Set[String] =
    Set("ivf_knn_join_auto", "semdedup_auto", "gnn_sage_nnd_auto")

  /** Designed-linear headliners across the engine's families. Round 16
    * adds (a) the graph tier — the most expensive battery rows had no
    * sf10 evidence (one 10× point cannot type a curve, this file's own
    * thesis; the pageRank precedent says the decade finds real defects);
    * (b) the production-sizing dedup siblings, measured at the decade
    * they were built for. Registered q_semdedup is deliberately ABSENT:
    * its oracle pins nlist = 16, making the within-cell pair stage
    * O(n²/nlist) BY DESIGN; `semdedup_auto` below is its auto-sized
    * decade shape. q_gnn_sage_nnd was in the same boat until round 17 —
    * its registration now auto-sizes (nlist = 0 → ⌈√n⌉ with a
    * ⌈√n⌉-recomputing oracle), so `gnn_sage_nnd_auto` measures EXACTLY
    * the registered query's edge-graph stage (the name is kept for
    * artifact continuity; the r16 pin read sf10 612 s / slope2 28.4×,
    * the pin's quadratic — see the PLANS.md decision rows). Round 17
    * also adds q_harmonic_hb, the HyperBall unbounded-hop form whose
    * whole point is the decade curve (per-round state independent of
    * source count). */
  val headliners: Seq[String] = Seq(
    "q1_agg", "q3_topk", "q5_revenue",                       // scan/agg/join
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash",   // dedup
    "q_dedup_simhash_scaled",
    "q_line_dedup", "q_winnow_pairs", "q_winnow_pairs_scaled",
    "q_boilerplate",
    "q_cdc_chunks", "q_srp_lsh_scaled", "q_dup_ngrams",
    "q_perplexity", "q_token_count", "q_gopher_rules",       // text curation
    "q_bm25",
    "q_connected_components", "q_pagerank",                  // graph fixpoints
    "q_scc", "q_ktruss", "q_bowtie", "q_louvain", "q_harmonic", // graph tier
    "q_harmonic_hb",
    "q_sessionize", "q_hll", "q_stratified_sample")          // window/sketch/sample

  /** The IVF production-sizing shapes (nlist = 0 → auto ⌈√n⌉). */
  private def autoShapes(spark: SparkSession): Seq[(String, String => Long)] = Seq(
    "ivf_knn_join_auto" -> { dir: String =>
      val emb = Tables(spark, dir).embeddings
      val index = graft.sim.Ann.ivfBuild(emb, "vec_id", "embedding", nlist = 0)
      graft.sim.Ann.knnJoinIvf(
        emb.filter(col("vec_id") % 50 === 0), index,
        "vec_id", "embedding", nprobe = 4, k = 10).count()
    },
    "semdedup_auto" -> { dir: String =>
      graft.dedup.Dedup.semDedup(
        Tables(spark, dir).embeddings, "vec_id", "embedding",
        nlist = 0, threshold = 0.25).count()
    },
    "gnn_sage_nnd_auto" -> { dir: String =>
      val sub = Tables(spark, dir).embeddings
        .filter(col("vec_id") % 5 === 0)
        .select(col("vec_id"), col("embedding"))
      val g = graft.sim.Ann.nnDescent(sub, "vec_id", "embedding",
        k = 5, rounds = 2, nlist = 0).last
      val edges = g.select(col("src"), col("dst"))
        .unionByName(g.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      graft.sim.Gnn.sageMeanLayer(sub, edges, "vec_id", "embedding").count()
    })

  def main(args: Array[String]): Unit = {
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "target/sf1")
    val sf10Dir = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR", "target/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_DECADE_OUT", "SCALE_DECADE.json")
    val anchorsPath = sys.env.getOrElse("SPARK_GRAFT_BASELINE", "BASELINE.md")

    val anchorRe = """\|\s*(q\S+)\s*\|\s*([0-9.]+)\s*\|""".r
    val anchors: Map[String, Double] = {
      val src = scala.io.Source.fromFile(anchorsPath, "UTF-8")
      try anchorRe.findAllMatchIn(src.mkString)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
      finally src.close()
    }

    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    GraftSession.install(spark)
    spark.sparkContext.setLogLevel("WARN")

    def hygiene(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    val work: Seq[(String, String => Long)] =
      headliners.map { n =>
        n -> { dir: String => SparkEntry.queries(n)(spark, dir).count() }
      } ++ autoShapes(spark)
    def timeOnce(fn: String => Long, dir: String): Double = {
      val t0 = System.nanoTime()
      fn(dir)
      val dt = (System.nanoTime() - t0) / 1e9
      hygiene()
      dt
    }

    // JVM warm preamble at the SMALL decade (same rationale as graft.Bench)
    Seq("q1_agg", "q3_topk").foreach { w =>
      SparkEntry.queries.get(w).foreach { fn =>
        try { fn(spark, sf1Dir).count(); fn(spark, sf1Dir).count(); hygiene() }
        catch { case _: Throwable => () }
      }
    }

    final case class Row(name: String, sf01: Double, sf1: Double,
        sf10: Double, slope1: Double, slope2: Double,
        settled: Boolean, over: Boolean, refreshed: Boolean = false,
        stale: Boolean = false)
    // gate on the TOTAL anchor→sf10 slope, not the per-decade ratio:
    // slope2 alone punishes exactly the entries whose sf1 reading is
    // fixed-overhead-bound (a 4 s sf1 entry can triple its per-row cost
    // at sf10 and still be comfortably sublinear overall) and rewards
    // inflated sf1 readings. 100× data + the ScaleBench per-decade
    // convention (12× = 10× + 20% headroom) compounds to 144×; the gate
    // uses the STRICTER 120× with a 20 s absolute floor (sub-20 s sf10
    // entries are machinery, not structure). slope1/slope2 stay recorded
    // for reading the curve.
    def gateOver(name: String, sf01: Double, t10: Double): Boolean =
      !designedN15(name) && sf01 > 0 && t10 > 120 * sf01 && t10 > 20.0
    var failed = Vector.empty[(String, String)]
    val selected: Seq[(String, String => Long)] =
      if (args.isEmpty) work
      else {
        val unknown = args.toSet -- work.map(_._1).toSet
        require(unknown.isEmpty, s"unknown decade entries: ${unknown.mkString(", ")}")
        work.filter(kv => args.contains(kv._1))
      }

    // Refresh mode (named args): carry every other entry from the
    // existing artifact unchanged, replace the named rows, recompute the
    // summary — the focused-settlement instrument for a battery row that
    // a contaminated host window inflated (same policy as Bench's
    // focused runs; refreshed rows are marked in the artifact). Parsed
    // BEFORE any measurement and FATAL on a missing/corrupt artifact: a
    // swallowed parse failure here would silently shrink the artifact to
    // only the named rows — dropping every other entry and recomputing
    // gate_fail (and the exit code) over the shrunken set.
    // Old artifact rows for the NAMED entries, kept aside so a refresh
    // whose re-measurement throws does not destroy the previous reading:
    // the failed name's old row is re-carried marked `stale` (advice
    // round-16 — the old behavior dropped it from both carried and rows).
    val staleBackstop = scala.collection.mutable.Map.empty[String, Row]
    val carried: Seq[Row] =
      if (args.isEmpty) Seq.empty
      else try {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = mapper.readTree(
          java.nio.file.Files.readString(java.nio.file.Paths.get(outPath)))
        val qs = root.get("queries")
        require(qs != null && qs.isObject,
          s"no 'queries' object in $outPath")
        val fresh = selected.map(_._1).toSet
        val it = qs.fieldNames()
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (it.hasNext) {
          val n = it.next()
          val q = qs.get(n)
          val row = Row(n, q.get("sf01").asDouble, q.get("sf1").asDouble,
            q.get("sf10").asDouble, q.get("slope1").asDouble,
            q.get("slope2").asDouble,
            q.has("settled") && q.get("settled").asBoolean,
            gateOver(n, q.get("sf01").asDouble, q.get("sf10").asDouble),
            refreshed = q.has("refreshed") && q.get("refreshed").asBoolean)
          if (!fresh(n)) buf += row
          else staleBackstop(n) = row.copy(stale = true)
        }
        buf.toSeq
      } catch {
        case e: Throwable =>
          System.err.println(s"[decade] refresh mode cannot load existing " +
            s"artifact $outPath (${e.getClass.getSimpleName}: ${e.getMessage}); " +
            "refusing to overwrite it with only the named rows — run " +
            "without args for a full battery, or fix/remove the artifact")
          spark.stop()
          sys.exit(2)
      }

    val rows = selected.flatMap { case (name, fn) =>
      try {
        System.gc()
        val t1 = timeOnce(fn, sf1Dir)
        val t10a = timeOnce(fn, sf10Dir)
        val a = anchors.getOrElse(name, 0.0)
        val slope1 = if (a > 0) t1 / a else 0.0
        // self-settle a flagged second decade: GC + warm + min of 2 (the
        // ScaleBench convention — battery position and ambient drift
        // inflate single shots; the gate hunts structure, not hosts)
        val (t10, settled) =
          if (!gateOver(name, a, t10a)) (t10a, false)
          else {
            System.gc()
            val ts = (1 to 2).map(_ => timeOnce(fn, sf10Dir))
            (math.min(t10a, ts.min), true)
          }
        Some(Row(name, a, t1, t10, slope1, t10 / t1, settled,
          gateOver(name, a, t10), refreshed = args.nonEmpty))
      } catch {
        case e: Throwable =>
          failed :+= name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}"
          None
      }
    }

    // A named row whose re-measurement failed keeps its previous
    // artifact entry (marked stale) — exit 1 still fires via `failed`.
    val rescued = failed.flatMap { case (n, _) => staleBackstop.get(n) }
    val allRows = carried ++ rows ++ rescued

    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qmap = allRows.map { r =>
      s"\"${r.name}\":{\"sf01\":${fmt(r.sf01)},\"sf1\":${fmt(r.sf1)},\"sf10\":${fmt(r.sf10)}," +
        s"\"slope1\":${fmt(r.slope1)},\"slope2\":${fmt(r.slope2)}" +
        (if (r.settled) ",\"settled\":true" else "") +
        (if (r.refreshed) ",\"refreshed\":true" else "") +
        (if (r.stale) ",\"refresh_failed\":true" else "") +
        (if (r.over) ",\"over\":true" else "") + "}"
    }.mkString("{", ",", "}")
    val overNames = allRows.filter(_.over).map(_.name)
    val fmap = failed.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replace("\"", "'").replace("\n", " ") + "\"" }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"scale_decade","n_queries":${allRows.size},"gate":"sf10 <= 120 x sf0.1 anchor (and > 20 s floor); designed-n^1.5 exempt","sf1_total_s":${fmt(allRows.map(_.sf1).sum)},"sf10_total_s":${fmt(allRows.map(_.sf10).sum)},"gate_fail":${overNames.size},"gate_fail_names":${
        overNames.map("\"" + _ + "\"").mkString("[", ",", "]")},"failed":$fmap,"sf1_dir":"$sf1Dir","sf10_dir":"$sf10Dir","queries":$qmap}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Throwable => System.err.println(s"[decade] dump write failed: ${e.getMessage}") }
    println(line.take(1800))
    spark.stop()
    if (overNames.nonEmpty || failed.nonEmpty) sys.exit(1)
  }
}
