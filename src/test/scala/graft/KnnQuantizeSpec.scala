package graft

import graft.plans.VectorFunctions.nearestCentroids
import graft.sim.{Ann, Quantize}
import org.apache.spark.sql.functions._

class KnnQuantizeSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random unit-ish vectors
  private def vec(seed: Long, dims: Int = 8): Seq[Float] =
    (0 until dims).map { i =>
      val x = (seed * 2654435761L + i * 40503L) % 1000
      (x / 500.0f) - 1.0f
    }

  private val corpus = (1L to 60L).map(i => (i, vec(i)))

  test("knnClassify: majority of nearest labeled neighbors wins; ties break to best cosine") {
    // labeled seeds: two "a" near the x-axis, two "b" near the y-axis
    val labeled = Seq(
      (101L, Seq(1.0f, 0.0f), "a"), (102L, Seq(0.95f, 0.1f), "a"),
      (103L, Seq(0.0f, 1.0f), "b"), (104L, Seq(0.1f, 0.95f), "b"))
      .toDF("id", "v", "lab")
    val unlabeled = Seq(
      (1L, Seq(0.9f, 0.2f)), // x-ish → a
      (2L, Seq(0.2f, 0.9f))) // y-ish → b
      .toDF("id", "v")
    val out = graft.sim.Ann.knnClassify(unlabeled, labeled, "id", "v", "lab", k = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // k=3 votes: doc1 gets {a,a,b} → a; doc2 gets {b,b,a} → b
    assert(out == Map(1L -> "a", 2L -> "b"))
  }

  test("nearestCentroids matches a brute-force reference incl. tie order") {
    val cents = (0L until 6L).map(c => c -> vec(c * 7 + 100).map(_.toDouble))
    val df = corpus.toDF("id", "v")
      .select(col("id"), nearestCentroids(col("v"), cents, 3).as("cids"))
      .as[(Long, Seq[Long])].collect().toMap
    corpus.foreach { case (id, v) =>
      val want = cents.map { case (cid, cv) =>
        val d = v.zip(cv).foldLeft(0.0) { case (a, (x, c)) => val e = x - c; a + e * e }
        (d, cid)
      }.sortBy { case (d, cid) => (d, cid) }.take(3).map(_._2)
      assert(df(id) == want, s"id=$id")
    }
  }

  test("nearestCentroids caps nprobe at the centroid count") {
    val cents = Seq(0L -> Seq(0.0, 0.0), 1L -> Seq(1.0, 1.0))
    val got = Seq((1L, Seq(0.1f, 0.1f))).toDF("id", "v")
      .select(nearestCentroids(col("v"), cents, 5))
      .as[Seq[Long]].head()
    assert(got == Seq(0L, 1L))
  }

  test("vecMean: exact elementwise means, null vectors ignored, map-side partial agg") {
    import graft.plans.VecMean.vecMean
    val df = Seq(
      ("a", Some(Seq(1.0f, 2.0f, 3.0f))),
      ("a", Some(Seq(3.0f, 4.0f, 5.0f))),
      ("a", None),
      ("b", Some(Seq(10.0f, 0.0f, -2.0f)))).toDF("g", "v")
    val out = df.groupBy("g").agg(vecMean(col("v")).as("m"))
      .orderBy("g").as[(String, Seq[Double])].collect().toSeq
    assert(out == Seq(("a", Seq(2.0, 3.0, 4.0)), ("b", Seq(10.0, 0.0, -2.0))))
    // partial-aggregatable: the plan carries a partial vec_mean below the
    // exchange (ObjectHashAggregate partial_vec_mean), not a full-row shuffle
    val plan = df.groupBy("g").agg(vecMean(col("v")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_vec_mean"), s"no map-side partial:\n$plan")
  }

  test("vecMean: zero-dimension groups survive a partial-buffer round trip") {
    import graft.plans.VecMean.vecMean
    // All-empty-array group: d = 0 with n > 0 must serialize/merge to an
    // empty (non-null) mean even when partials cross a shuffle — force
    // many input partitions so map-side buffers are serialized and merged.
    val df = Seq(
      ("a", Seq.empty[Double]), ("a", Seq.empty[Double]),
      ("b", Seq(2.0)), ("b", Seq(4.0))).toDF("g", "v").repartition(8)
    val out = df.groupBy("g").agg(vecMean(col("v")).as("m"))
      .orderBy("g").as[(String, Option[Seq[Double]])].collect().toSeq
    assert(out == Seq(("a", Some(Seq.empty[Double])), ("b", Some(Seq(3.0)))))
  }

  test("PCA: recovers a planted principal axis; components orthonormal; transform centers") {
    import graft.sim.Pca
    // points along a fixed 8-dim axis + small deterministic off-axis noise
    val d = 8
    val axis = Array.tabulate(d)(i => if (i == 2) 3.0 else if (i == 5) 4.0 else 0.0)
    val axisN = axis.map(_ / 5.0) // unit
    val rows = (0 until 400).map { r =>
      val t = (r % 40) - 20.0 // spread along the axis
      val noise = 0.05 * math.sin(r * 2.399)
      val v = Array.tabulate(d)(i => t * axisN(i) + (if (i == (r % d)) noise else 0.0))
      Tuple1(v.toSeq)
    }
    val df = rows.toDF("v")
    val model = Pca.fit(df, "v", k = 2)
    // first component aligns with the planted axis (sign-free)
    val align = math.abs(model.components(0).zip(axisN).map { case (a, b) => a * b }.sum)
    assert(align > 0.999, s"axis alignment $align")
    assert(model.variances(0) > 10 * model.variances(1).max(1e-12))
    // orthonormal
    val c0 = model.components(0); val c1 = model.components(1)
    assert(math.abs(c0.map(x => x * x).sum - 1.0) < 1e-6)
    assert(math.abs(c0.zip(c1).map { case (a, b) => a * b }.sum) < 1e-6)
    // transform: mean of coordinates is ~0 (centered projection)
    val coords = Pca.transform(df, "v", model, "pc")
      .select(col("pc")(0)).as[Double].collect()
    assert(math.abs(coords.sum / coords.length) < 1e-9)
    assert(coords.max - coords.min > 30) // the planted spread survives
  }

  test("vecGram: exact Gram matrix on a hand example across partitions") {
    import graft.plans.VecGram.vecGram
    val df = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)).map(Tuple1.apply).toDF("v").repartition(4)
    val g = df.agg(vecGram(col("v"))).as[Seq[Double]].head()
    // [1,2]·[1,2]ᵀ + [3,4]·[3,4]ᵀ = [[10,14],[14,20]]
    assert(g == Seq(10.0, 14.0, 14.0, 20.0))
  }

  test("SRP-LSH: identical vectors collide in every band, near pairs surface, far pairs verified out") {
    import graft.sim.Srp
    val a = vec(7L)
    val near = a.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }
    val far = vec(99L)
    val df = Seq((1L, a), (2L, a), (3L, near), (4L, far))
      .toDF("vec_id", "embedding")
    val sigs = Srp.signatures(df, "vec_id", "embedding", dims = 8, nBands = 2, bitsPerBand = 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(sigs.size == 8) // one row per (id, band)
    val byId = sigs.groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3)).toSet).toMap
    assert(byId(1L) == byId(2L)) // identical vectors: identical signatures
    val dups = Srp.nearDups(df, "vec_id", "embedding", dims = 8, nBands = 2,
        bitsPerBand = 4, minCosine = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dups.contains((1L, 2L))) // exact dup always survives
    assert(!dups.exists { case (x, y) => x == 4L || y == 4L } ||
      VectorsClose(a, far), "far vector must not pass the 0.99 cosine verify")
  }

  private def VectorsClose(a: Seq[Float], b: Seq[Float]): Boolean = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    dot / (na * nb) >= 0.99
  }

  test("int8 quantization: exact codes on a hand vector, error bound on random") {
    val df = Seq((1L, Seq(127.0f, -127.0f, 63.5f, 0.0f))).toDF("id", "v")
    val (scale, q) = Quantize.quantizeInt8(df, "v")
      .select(col("q_scale"), col("q")).as[(Double, Seq[Byte])].head()
    assert(scale == 1.0)
    assert(q == Seq[Byte](127, -127, 64, 0)) // 63.5 rounds half-up to 64
    // reconstruction error ≤ scale/2 per dim
    val rnd = corpus.toDF("id", "v")
    val maxErr = Quantize.quantizeInt8(rnd, "v")
      .select(max(aggregate(
        zip_with(col("v"), col("q"),
          (x, qi) => abs(x.cast("double") - qi.cast("double") * col("q_scale"))),
        lit(0.0), (a, e) => greatest(a, e))))
      .as[Double].head()
    val maxScale = Quantize.quantizeInt8(rnd, "v")
      .select(max(col("q_scale"))).as[Double].head()
    assert(maxErr <= maxScale / 2 + 1e-12, s"err $maxErr vs ${maxScale / 2}")
  }

  test("int8 cosine tracks float cosine within quantization error") {
    val a = corpus.toDF("id", "v")
    val qz = Quantize.quantizeInt8(a, "v")
    val q0 = broadcast(qz.filter($"id" === 1L)
      .select($"v".as("v0"), $"q".as("q0")))
    val rows = qz.filter($"id" =!= 1L).crossJoin(q0)
      .select(
        graft.plans.VectorFunctions.vecCosine($"v", $"v0").as("exact"),
        Quantize.int8Cosine($"q", $"q0").as("approx"))
      .as[(Double, Double)].collect()
    rows.foreach { case (e, ap) =>
      assert(math.abs(e - ap) < 0.02, s"exact $e approx $ap")
    }
  }

  test("knnJoinExact matches a plain-Scala kNN reference") {
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y }
      val na = math.sqrt(a.foldLeft(0.0)((s, x) => s + x.toDouble * x))
      val nb = math.sqrt(b.foldLeft(0.0)((s, x) => s + x.toDouble * x))
      dot / (na * nb)
    }
    val probes = corpus.filter(_._1 % 20 == 0) // ids 20, 40, 60
    val want = probes.flatMap { case (pid, pv) =>
      corpus.filter(_._1 != pid)
        .map { case (id, v) => (pid, id, cos(v, pv)) }
        .sortBy { case (_, id, c) => (-c, id) }.take(4)
        .zipWithIndex.map { case ((p, id, c), i) => (p, id, i + 1L) }
    }.toSet
    val got = Ann.knnJoinExact(
        probes.toDF("id", "v"), corpus.toDF("id", "v"), "id", "v", k = 4)
      .select($"probe_id", $"id", $"rk").as[(Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("knnJoinIvf is deterministic and recall ≥ 0.5 at nprobe=2/nlist=4") {
    val df = corpus.toDF("id", "v")
    val index = Ann.ivfBuild(df, "id", "v", nlist = 4)
    val probes = df.filter($"id" % 20 === 0)
    def run() = Ann.knnJoinIvf(probes, index, "id", "v", nprobe = 2, k = 4)
      .select($"probe_id", $"id").as[(Long, Long)].collect().toSet
    val approx = run()
    assert(approx == run()) // deterministic
    val exact = Ann.knnJoinExact(probes, df, "id", "v", k = 4)
      .select($"probe_id", $"id").as[(Long, Long)].collect().toSet
    val recall = (approx & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall")
    // every approx neighbour really lives in a probed cell of its probe
    assert(approx.size == 3 * 4 || approx.size == (approx.groupBy(_._1).values.map(_.size).sum))
  }

  test("ivfBuildHier: two-stage assign is deterministic, cid-valid, and agrees with flat assign off the supercell boundaries") {
    val df = corpus.toDF("id", "v")
    val flat = Ann.ivfBuild(df, "id", "v", nlist = 16)
    val hier = Ann.ivfBuildHier(df, "id", "v", nlist = 16) // nsuper auto = 4
    // identical codebook (grouping touches assignment, never training)
    assert(hier.centroids == flat.centroids)
    val flatA = flat.assigned.select("id", "cid").as[(Long, Long)].collect().toMap
    val hierA = hier.assigned.select("id", "cid").as[(Long, Long)].collect().toMap
    assert(hierA.keySet == flatA.keySet)
    // every assigned cid is a real centroid id
    val cids = flat.centroids.map(_._1).toSet
    assert(hierA.values.forall(cids))
    // deterministic: a rebuild assigns identically
    val hier2 = Ann.ivfBuildHier(df, "id", "v", nlist = 16)
      .assigned.select("id", "cid").as[(Long, Long)].collect().toMap
    assert(hier2 == hierA)
    // boundary-only divergence: vectors whose global-nearest centroid
    // sits in the stage-1 supercell MUST match flat exactly — recompute
    // the reference driver-side from the same grouping
    val groups = Ann.groupCentroids(flat.centroids, 4)
    val superOf = groups.zipWithIndex.flatMap { case ((_, mem), gi) =>
      mem.map(_._1 -> gi) }.toMap
    val vecs = corpus.toMap
    var agree = 0
    corpus.foreach { case (id, v) =>
      val vd = v.map(_.toDouble)
      val gBest = flat.centroids.minBy { case (cid, cv) =>
        (Ann.l2sqLocal(vd, cv), cid) }._1
      val sBest = groups.zipWithIndex.minBy { case ((sc, _), gi) =>
        (Ann.l2sqLocal(vd, sc), gi) }._2
      if (superOf(gBest) == sBest) {
        assert(hierA(id) == flatA(id),
          s"id=$id: global-nearest cid $gBest lives in the probed supercell but hier picked ${hierA(id)}")
        agree += 1
      }
    }
    // the non-boundary case must dominate on this corpus, or the spec
    // proves nothing
    assert(agree >= corpus.size / 2, s"only $agree/${corpus.size} off-boundary")
  }

  test("mutualKnn keeps reciprocal pairs only, a<b, hub edge dropped") {
    // k=1: {1,2} are each other's nearest (mutual), {3,4} likewise;
    // 5 points toward cluster {1,2} so NN(5)=1, but NN(1)=2 — the
    // asymmetric hub edge must NOT survive
    val pts = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.99f, 0.14f)),
      (3L, Array(0.0f, -1.0f)),
      (4L, Array(0.1f, -0.99f)),
      (5L, Array(0.8f, 0.6f)))
    val got = Ann.mutualKnn(pts.toDF("id", "v"), "id", "v", k = 1)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (3L, 4L)))
  }

  test("nnDescent: recall vs exact graph climbs monotonically over rounds") {
    import graft.sim.Ann
    // 4 well-separated clusters of 10, 8-dim; exact 3-NN stays in-cluster
    val rnd = new scala.util.Random(7)
    val vecs = for (c <- 0 until 4; j <- 0 until 10) yield {
      val base = Array.tabulate(8)(d => if (d == c * 2) 10f else 0f)
      ((c * 10 + j).toLong,
        base.map(x => x + rnd.nextFloat() * 0.5f).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val graphs = Ann.nnDescent(df, "vec_id", "embedding",
      k = 3, rounds = 3, nlist = 4)
    val exact = Ann.knnJoinExact(df, df, "vec_id", "embedding", 3)
      .select(col("probe_id").as("src"), col("id").as("dst"))
    val exactSet = exact.as[(Long, Long)].collect().toSet
    val recalls = graphs.map { g =>
      val edges = g.select(col("src"), col("dst"))
        .as[(Long, Long)].collect().toSet
      edges.intersect(exactSet).size.toDouble / exactSet.size
    }
    recalls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a, s"recall must not regress: $recalls")
    }
    assert(recalls.last > recalls.head,
      s"local joins must improve the seed graph: $recalls")
    assert(recalls.last > 0.8,
      s"clustered data should converge near the exact graph: $recalls")
    // every graph keeps at most k edges per node
    graphs.foreach { g =>
      val maxDeg = g.groupBy("src").count()
        .agg(max(col("count"))).head().getLong(0)
      assert(maxDeg <= 3)
    }
  }

  test("mmrRerank diversifies: near-duplicate of pick 1 is demoted below an orthogonal doc") {
    // Pure relevance order would be 1, 2, 4 — but doc 2 is nearly
    // identical to doc 1 (cos ≈ 0.999), so with λ=0.7/μ=0.3 its MMR
    // score at step 2 is 0.7·0.90 − 0.3·0.999 ≈ 0.330, losing to the
    // orthogonal doc 3 at 0.7·0.50 − 0 = 0.35. Step 3 then picks doc 2
    // (0.330) over doc 4 (0.7·0.60 − 0.3·0.7071 ≈ 0.208).
    val pool = Seq(
      (1L, Array(1.0f, 0.0f), 0.95),
      (2L, Array(0.999f, 0.045f), 0.90),
      (3L, Array(0.0f, 1.0f), 0.50),
      (4L, Array(0.7f, 0.7f), 0.60))
      .toDF("id", "v", "rel")
    val got = Ann.mmrRerank(pool, "id", "v", "rel", k = 3, lam = 0.7, mu = 0.3)
      .select($"rank", $"id").as[(Long, Long)].collect().sorted
    assert(got.toSeq == Seq((1L, 1L), (2L, 3L), (3L, 2L)))
    // rank 1 carries mmr = λ·rel exactly (empty-selection max-sim is 0)
    val r1 = Ann.mmrRerank(pool, "id", "v", "rel", k = 1, lam = 0.7, mu = 0.3)
      .select($"mmr").as[Double].head()
    assert(math.abs(r1 - 0.7 * 0.95) < 1e-12)
  }

  test("mrlRecall: full width reads exactly 1.0; all rows well-formed") {
    val emb = Tables(spark, sf).embeddings
    val out = Ann.mrlRecall(emb, emb.filter($"vec_id" % 50 === 0),
        "vec_id", "embedding", dims = Seq(16, 32, 64), k = 5)
      .orderBy("d_trunc").collect()
    assert(out.length == 3)
    val full = out.last
    assert(full.getAs[Long]("d_trunc") == 64L)
    assert(full.getAs[Double]("recall") == 1.0)
    out.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("n_probes") * 5)
    }
  }

  test("hammingRecall: sign-identical corpus copies rank first (recall 1 on a planted axis set)") {
    // corpus where hamming order == cosine order by construction:
    // axis-aligned one-hot-ish vectors; each probe's cosine-top-1 is its
    // sign-twin, which also has hamming 0
    val c = Seq(
      (1L, Seq(1.0f, -1.0f, 1.0f, -1.0f)),
      (2L, Seq(0.9f, -0.9f, 0.9f, -0.9f)),   // sign-twin of 1
      (3L, Seq(-1.0f, 1.0f, -1.0f, 1.0f)),
      (4L, Seq(-0.9f, 0.9f, -0.9f, 0.9f)))   // sign-twin of 3
      .toDF("id", "v")
    val out = Ann.hammingRecall(c, c.filter($"id" % 2 === 1), "id", "v", k = 1)
      .collect().head
    assert(out.getAs[Long]("n_probes") == 2L)
    assert(out.getAs[Double]("recall") == 1.0)
  }

  test("packSignBits/hammingPacked: packed XOR-popcount equals the unpacked sign-mismatch count") {
    val emb = Tables(spark, sf).embeddings.limit(200)
    val a = emb.select($"vec_id".as("ia"), $"embedding".as("va"),
      Quantize.packSignBits($"embedding", 64).as("pa"))
    val b = emb.select($"vec_id".as("ib"), $"embedding".as("vb"),
      Quantize.packSignBits($"embedding", 64).as("pb"))
    val pairs = a.crossJoin(b).filter($"ia" < $"ib" && ($"ia" + $"ib") % 7 === 0)
    val unpacked = size(filter(
      zip_with($"va", $"vb", (x, y) => (x > 0f) =!= (y > 0f)), p => p)).cast("long")
    val mismatches = pairs
      .select(unpacked.as("h0"), Quantize.hammingPacked($"pa", $"pb").as("h1"))
      .filter($"h0" =!= $"h1").count()
    assert(mismatches == 0L)
    // and a 64-dim vector packs into exactly ONE long (the 32x claim)
    assert(a.select(size($"pa")).distinct().collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("packSignBits: 100-dim vectors pack into two words; tail bits stay consistent") {
    // 100 dims -> word 0 holds dims 1-64, word 1 holds dims 65-100
    val v1 = (1 to 100).map(i => if (i % 3 == 0) 1.0f else -1.0f)
    val v2 = (1 to 100).map(i => if (i % 3 == 0) 1.0f else -1.0f)
    val v3 = v2.updated(99, 1.0f) // flip the last dim
    val df = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("id", "v")
      .withColumn("p", Quantize.packSignBits($"v", 100))
    val rows = df.orderBy("id").collect()
    assert(rows.forall(_.getAs[Seq[Long]]("p").size == 2))
    val d12 = df.filter($"id" === 1).select($"p").crossJoin(
      df.filter($"id" === 2).select($"p".as("p2")))
      .select(Quantize.hammingPacked($"p", $"p2")).head().getLong(0)
    val d23 = df.filter($"id" === 2).select($"p").crossJoin(
      df.filter($"id" === 3).select($"p".as("p2")))
      .select(Quantize.hammingPacked($"p", $"p2")).head().getLong(0)
    assert(d12 == 0L)
    assert(d23 == 1L)
  }

  test("semanticDecontaminate: planted copy flags at 1.0; orthogonal vector stays clean") {
    import graft.dedup.Dedup
    val bench = Seq((100L, Seq(1.0f, 0.0f, 0.0f)), (101L, Seq(0.0f, 1.0f, 0.0f)))
      .toDF("id", "v")
    val corpus = Seq(
      (1L, Seq(2.0f, 0.0f, 0.0f)),   // same direction as bench 100 → cos 1.0
      (2L, Seq(0.0f, 0.0f, 5.0f)))   // orthogonal to both → cos 0.0
      .toDF("id", "v")
    val out = Dedup.semanticDecontaminate(corpus, bench, "id", "v", 0.9)
      .orderBy("vec_id").collect()
    assert(out(0).getAs[Double]("max_cos") == 1.0)
    assert(out(0).getAs[Boolean]("contaminated"))
    assert(out(0).getAs[Long]("bench_id") == 100L)
    assert(out(1).getAs[Double]("max_cos") == 0.0)
    assert(!out(1).getAs[Boolean]("contaminated"))
  }

  test("semanticDecontaminate: cosine ties break to the smaller benchmark id") {
    import graft.dedup.Dedup
    val bench = Seq((200L, Seq(1.0f, 0.0f)), (50L, Seq(2.0f, 0.0f)))
      .toDF("id", "v") // same direction, both cos 1.0 vs the probe
    val corpus = Seq((1L, Seq(3.0f, 0.0f))).toDF("id", "v")
    val out = Dedup.semanticDecontaminate(corpus, bench, "id", "v", 0.5)
      .collect().head
    assert(out.getAs[Long]("bench_id") == 50L)
  }

  test("hammingRecall on real embeddings: recall in (0,1], better than chance") {
    val emb = Tables(spark, sf).embeddings
    val n = emb.count()
    val out = Ann.hammingRecall(emb, emb.filter($"vec_id" % 50 === 0),
      "vec_id", "embedding", k = 10).collect().head
    val rec = out.getAs[Double]("recall")
    assert(rec > 0.0 && rec <= 1.0)
    // chance level for k=10 of n candidates
    assert(rec > 10.0 / n * 3)
  }

  test("mrlRecall/hammingRecall: zero probes emit zero rows (degenerate-slice parity)") {
    // an ungrouped Spark agg always emits one row; a grouped oracle emits
    // none — the recall surfaces must side with the oracle on empty probes
    val emb = Tables(spark, sf).embeddings
    val none = emb.filter($"vec_id" < 0)
    assert(Ann.mrlRecall(emb, none, "vec_id", "embedding",
      dims = Seq(16, 64), k = 3).count() == 0L)
    assert(Ann.hammingRecall(emb, none, "vec_id", "embedding", k = 3)
      .count() == 0L)
  }

  test("ivfBuild: nlist=0 auto-sizes the codebook to ⌈√n⌉ (the measured sizing law)") {
    val emb = Tables(spark, sf).embeddings
    val n = emb.count()
    val want = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
    val index = Ann.ivfBuild(emb, "vec_id", "embedding", nlist = 0)
    assert(index.centroids.size == want)
    // the auto-sized index still assigns every vector exactly once
    assert(index.assigned.count() == n)
  }
}
