package graft

import graft.sim.{Ann, Pq}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf).embeddings
  private lazy val cb = Pq.fixedCodebook(emb, "vec_id", "embedding", m = 4, k = 16)

  test("codebook shape: m subspaces × k codes × subDim dims") {
    assert(cb.m == 4 && cb.subDim == 16)
    assert(cb.codes.forall(_.size == 16))
    assert(cb.codes.forall(_.forall(_._2.length == 16)))
    assert(cb.codes.head.map(_._1) == (0L until 16L))
  }

  test("codebook members encode to their own code (distance 0 to self)") {
    val codes = Pq.encode(emb.filter($"vec_id" < 16), "embedding", cb)
      .select($"vec_id", $"code_0", $"code_1", $"code_2", $"code_3")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(codes.length == 16)
    codes.foreach { case (id, c0, c1, c2, c3) =>
      assert(Seq(c0, c1, c2, c3).forall(_ == id),
        s"vec $id should be its own nearest code, got ($c0,$c1,$c2,$c3)")
    }
  }

  test("ADC distance equals a driver-side recomputation for every row") {
    val query = Ann.queryVector(spark, emb, "vec_id", 0L, "embedding")
    val got = Pq.encode(emb, "embedding", cb)
      .withColumn("adc", Pq.adcDistance(query, cb))
      .select($"vec_id", $"adc").as[(Long, Double)].collect().toMap
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect()
    def l2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    vecs.foreach { case (id, vf) =>
      val v = vf.map(_.toDouble)
      val want = (0 until 4).map { s =>
        val sub = v.slice(s * 16, (s + 1) * 16)
        val qSub = query.slice(s * 16, (s + 1) * 16)
        val code = cb.codes(s).minBy { case (c, cv) => (l2(sub, cv), c) }._1
        l2(qSub, cb.codes(s)(code.toInt)._2)
      }.sum
      assert(math.abs(got(id) - want) < 1e-9, s"vec $id: ${got(id)} vs $want")
    }
  }

  test("IVF-PQ results are the PQ scores restricted to the probed cells") {
    val query = Ann.queryVector(spark, emb, "vec_id", 0L, "embedding")
    val index = Ann.ivfBuild(emb, "vec_id", "embedding", nlist = 16)
    val got = Pq.ivfPqTopK(index, cb, query, nprobe = 4, k = 10)
      .as[(Long, Double)].collect().toSeq
    // reference: full PQ scores joined to the IVF assignment, filtered to
    // the 4 cells nearest the query, top-10 by (rounded dist, id)
    val allPq = Pq.encode(emb, "embedding", cb)
      .withColumn("adc_dist", round(Pq.adcDistance(query, cb), 4))
      .select($"vec_id", $"adc_dist").as[(Long, Double)].collect().toMap
    def l2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val probed = index.centroids
      .map { case (cid, cv) => (l2(query, cv), cid) }.sorted.take(4).map(_._2).toSet
    val cells = index.assigned.select($"id", $"cid").as[(Long, Long)].collect().toMap
    val want = allPq.toSeq
      .filter { case (id, _) => probed.contains(cells(id)) }
      .sortBy { case (id, d) => (d, id) }.take(10)
    assert(got == want)
  }

  test("trained codebook: per-subspace k-means, positional codes, recall@10 floor") {
    val query = Ann.queryVector(spark, emb, "vec_id", 0L, "embedding")
    val trained = Pq.trainedCodebook(emb, "vec_id", "embedding", m = 4, k = 16, iters = 2)
    // same downstream shape as the fixed codebook: positional 0..k-1 codes
    assert(trained.m == 4 && trained.subDim == 16)
    assert(trained.codes.forall(_.map(_._1) == (0L until 16L)))
    val exact = emb
      .withColumn("d", graft.plans.VectorFunctions.vecL2Sq(
        col("embedding"), array(query.map(lit): _*)))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSet
    // Jégou et al. R@R: the ADC pass produces a shortlist of R candidates
    // which an exact pass re-ranks — recall@10 is measured on the reranked
    // list. (Raw ADC top-10 on these near-random synthetic vectors is
    // ~0.1-0.2 for ANY codebook — quantization error dominates when all
    // pairwise distances concentrate; the shortlist+rerank shape is how PQ
    // is actually deployed.)
    def recallAt10(c: Pq.Codebook, shortlist: Int): Double = {
      val ids = Pq.adcTopK(emb, "vec_id", "embedding", c, query, shortlist)
        .select("vec_id").as[Long].collect()
      val reranked = emb.filter($"vec_id".isin(ids: _*))
        .withColumn("d", graft.plans.VectorFunctions.vecL2Sq(
          col("embedding"), array(query.map(lit): _*)))
        .orderBy(col("d"), col("vec_id")).limit(10)
        .select("vec_id").as[Long].collect().toSet
      (reranked & exact).size / 10.0
    }
    val rTrained = recallAt10(trained, 100)
    val rFixed = recallAt10(cb, 100)
    info(f"recall@10 (R=100 rerank) trained=$rTrained%.2f fixed=$rFixed%.2f")
    assert(rTrained >= 0.5, f"trained recall@10 $rTrained%.2f below floor 0.5")
    assert(rTrained >= rFixed,
      f"training made the codebook worse: $rTrained%.2f < $rFixed%.2f")
    assert(Pq.adcTopK(emb, "vec_id", "embedding", trained, query, 10)
      .select("vec_id").as[Long].collect().toSet.contains(0L))
  }

  test("fixedCodebook validates source size and rejects ragged vectors") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Pq.fixedCodebook(emb.filter($"vec_id" < 5), "vec_id", "embedding", m = 4, k = 16)
    }
    val ragged = Seq(
      (0L, Seq(1.0, 2.0, 3.0, 4.0)),
      (1L, Seq(1.0, 2.0))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Pq.fixedCodebook(ragged, "vec_id", "embedding", m = 2, k = 2)
    }
  }

  test("ADC top-10 recall against exact L2 top-10 is non-degenerate") {
    val query = Ann.queryVector(spark, emb, "vec_id", 0L, "embedding")
    val pq = Pq.adcTopK(emb, "vec_id", "embedding", cb, query, 10)
      .select("vec_id").as[Long].collect().toSet
    val exact = emb
      .withColumn("d", graft.plans.VectorFunctions.vecL2Sq(
        col("embedding"), array(query.map(lit): _*)))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSet
    // vec 0 IS the query: its ADC distance is the minimum possible for
    // its codes, and exact rank 0 — a sane index must retrieve it
    assert(pq.contains(0L), "query vector itself not retrieved")
    assert((pq & exact).nonEmpty, "zero overlap with exact top-10")
  }
}
