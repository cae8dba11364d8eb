package graft

import org.apache.spark.sql.SparkSession

/** Multi-JVM scale smoke — the cheapest way to surface what `local[32]`
  * structurally hides. In local mode every "exchange" is an in-process
  * array handoff and every "broadcast" a pointer: serialization bugs,
  * oversized broadcast payloads, and task-binary bloat are invisible.
  * `local-cluster[4,8,8192]` (4 real worker JVMs × 8 cores × 8 GiB,
  * standalone master/worker in-process but EXECUTORS as separate
  * processes) forces the real paths: closure + task serialization, wire
  * exchanges, TorrentBroadcast, remote block fetch.
  *
  * Target set: the top-20 most expensive battery queries (the
  * graph/iterative tier — where per-round exchanges amplify any wire
  * cost) plus the specific hazards the round-10 verdict called out as
  * locally-invisible: VecGram's d² buffers (q_dup_ngrams), the packed
  * Bloom literal (q_bloom_join), collected PQ codebooks
  * (q_ann_pq/q_ann_ivfpq), vector aggregates (q_gnn_sage,
  * q_bootstrap_ci), fused native md5 lanes (q_dedup_minhash), and two
  * shuffle-join shapes (q3_topk, q18_large_orders).
  *
  * Method: per query one untimed warmup + `SPARK_GRAFT_BENCH_REPS`
  * (default 1) timed runs (min reported — the smoke question is "does
  * the plan survive real exchanges at sane cost", not a steady-state
  * median). Compare the SAME main run with `SPARK_GRAFT_MASTER=
  * local[32]` and diff; divergence ≫ the worker-count ratio means a
  * serialization/broadcast assumption broke. Results → PLANS.md table.
  */
object ClusterSmoke {

  /** top-20 by committed baseline + verdict-named hazard shapes */
  val targets: Seq[String] = Seq(
    // expensive tier (baseline order)
    "q_bowtie", "q_cross_repeat", "q_global_suffix", "q_cdc_chunks",
    "q_louvain", "q_luby_mis", "q_scc", "q_node2vec", "q_ktruss",
    "q_incremental_cc", "q_nn_descent", "q_random_walks", "q_dbscan",
    "q_link_predict", "q_sorted_neighborhood", "q_harmonic",
    "q_boilerplate", "q_ppr_trust", "q_simjoin_prefix",
    "q_connected_components",
    // locally-invisible hazards
    "q_dup_ngrams", "q_bloom_join", "q_ann_pq", "q_ann_ivfpq",
    "q_gnn_sage", "q_bootstrap_ci", "q_dedup_minhash",
    "q3_topk", "q18_large_orders",
    // round-12 scale-path compositions (NN-Descent round shuffles +
    // IVF cell joins — both carry vector payloads over the wire)
    "q_gnn_sage_nnd", "q_hard_negatives_ivf", "q_knn_classify_ivf",
    // round-13 additions: TopKByScore TypedImperativeAggregate crossing
    // real executor boundaries (mrl runs it per truncation width), the
    // shingle-census + broadcast-grid tuner, and the broadcast
    // benchmark-slice struct-max screen
    "q_mrl_recall", "q_lsh_tune", "q_sem_decontaminate",
    // round-16 additions: the 120-bit two-lane fused fingerprint and the
    // auto-cap driver scalar + join, plus the hierarchical-assign
    // composition (below) whose nested group/map literals ride the task
    // binary — all three paths new this round, none otherwise crossing a
    // real executor boundary
    "q_dedup_simhash_scaled", "q_winnow_pairs_scaled", "ivf_hier_assign",
    // round-17 addition: HyperBall's RegisterMax TypedImperativeAggregate
    // (packed int[256] buffers serialized across real executor JVMs every
    // round — the TopKByScore precedent; the fused WinnowFingerprints
    // expression is already gated via q_winnow_pairs_scaled above)
    "q_harmonic_hb")

  /** Non-registry shapes that still need the multi-JVM gate: new
    * expression compositions no registry query exercises.
    * `ivf_hier_assign` serializes nearestCentroidHier's nested
    * array<array<array<double>>> group literal and cid→centroid map
    * literal into real task binaries (wprobe=2 default). */
  val extraShapes: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map("ivf_hier_assign" -> ((s, dir) =>
      graft.sim.Ann.ivfBuildHier(Tables(s, dir).embeddings,
        "vec_id", "embedding", nlist = 64).assigned))

  /** Run the target set once per master; one untimed warmup + `reps`
    * timed runs per query, min reported. */
  private def runSet(master: String, sfDir: String, names: Seq[String],
      reps: Int): Seq[(String, Double)] = {
    // executors are separate JVMs under local-cluster: they need the repo
    // classes on their own classpath (the driver's sbt classpath does not
    // propagate); harmless in plain local mode
    val classesDir = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val spark = GraftSession.configure(SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.executor.extraClassPath", classesDir)
      .config("spark.executor.memory", "7g"))
      .getOrCreate()
    GraftSession.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    val out = names.map { name =>
      val fn = extraShapes.getOrElse(name,
        SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown query: $name")))
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        spark.catalog.clearCache()
        dt
      }
      try {
        once() // warmup
        val t = (1 to reps).map(_ => once()).min
        println(f"[cluster-smoke] $name%-24s ${t}%7.2f s  ($master)")
        name -> t
      } catch {
        case e: Throwable =>
          println(s"[cluster-smoke] $name FAILED: ${e.getClass.getSimpleName}: " +
            String.valueOf(e.getMessage).take(200))
          name -> -1.0
      }
    }
    spark.stop()
    out
  }

  /** Per-round gate (round-12): one invocation runs the CONTROL
    * (`local[32]`) and the multi-JVM cluster back to back, diffs them,
    * and writes a JSON artifact with a per-query verdict. Gate rule:
    * a query fails when cluster > 2× control + 0.75 s (the absolute
    * slack keeps sub-second entries from tripping the ratio on noise)
    * or when it errors under either master; the run fails if any query
    * fails. The artifact (default `CLUSTER_SMOKE.json`, override with
    * `SPARK_GRAFT_CLUSTER_OUT`) is committed per round as CLUSTER_r{N}.
    *
    * REQUIRES `SPARK_SCALA_VERSION=2.13` (and `SPARK_HOME`, e.g.
    * /opt/spark) in the environment: the local-cluster worker builds
    * each executor's launch command via the launcher's
    * `getScalaVersion`, which — without the env override — looks for
    * SOURCE-build directories (`launcher/target/scala-*`) that a binary
    * distribution doesn't have; every executor then dies at spawn with
    * "Cannot find any build directories" and the master removes the
    * app. */
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val clusterMaster =
      sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[4,8,8192]")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1").toInt
    val selected = if (args.isEmpty) targets else args.toSeq
    def judge(control: Map[String, Double], cluster: Map[String, Double],
        names: Seq[String]): Seq[(String, Double, Double, Double, Boolean)] =
      names.map { name =>
        val c0 = control(name); val c1 = cluster(name)
        val ratio = if (c0 > 0 && c1 >= 0) c1 / c0 else -1.0
        val pass = c0 >= 0 && c1 >= 0 && c1 <= 2.0 * c0 + 0.75
        (name, c0, c1, ratio, pass)
      }
    var rows = judge(
      runSet("local[32]", sfDir, selected, reps).toMap,
      runSet(clusterMaster, sfDir, selected, reps).toMap, selected)
    // Two-stage verdict: n=1 screening puts mid-weight queries within
    // one GC spike of the 2x boundary (r12: q_simjoin_prefix read 2.44x
    // on one screening rep, 1.19x at n=3), so boundary failures are
    // automatically re-measured at n=3 (min) and the confirmed figure
    // replaces the screen. A genuine divergence survives the re-measure;
    // noise does not cost a manual re-run.
    val suspects = rows.filter(!_._5).map(_._1)
    if (suspects.nonEmpty) {
      println(s"[cluster-smoke] re-measuring ${suspects.size} screening " +
        s"failure(s) at n=3: ${suspects.mkString(", ")}")
      val confirmed = judge(
        runSet("local[32]", sfDir, suspects, 3).toMap,
        runSet(clusterMaster, sfDir, suspects, 3).toMap, suspects)
        .map(r => r._1 -> r).toMap
      rows = rows.map(r => confirmed.getOrElse(r._1, r))
    }
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    rows.foreach { case (name, c0, c1, ratio, pass) =>
      println(f"[cluster-smoke] $name%-24s control ${c0}%7.2f  cluster ${c1}%7.2f  " +
        f"ratio ${ratio}%5.2f  ${if (pass) "ok" else "FAIL"}")
    }
    val allPass = rows.forall(_._5)
    val json = rows.map { case (n, c0, c1, r, p) =>
      "\"" + n + "\":{\"control_s\":" + fmt(c0) + ",\"cluster_s\":" + fmt(c1) +
        ",\"ratio\":" + fmt(r) + ",\"pass\":" + p + "}"
    }.mkString("{", ",", "}")
    val line =
      s"""{"gate":"${if (allPass) "pass" else "fail"}","master":"$clusterMaster","n":${rows.size},"n_fail":${rows.count(!_._5)},"queries":$json,"sf":"$sfDir"}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_CLUSTER_OUT", "CLUSTER_SMOKE.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    println(s"[cluster-smoke] gate=${if (allPass) "pass" else "fail"} -> $outPath")
    if (!allPass) sys.exit(1)
  }
}
