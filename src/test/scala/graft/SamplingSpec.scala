package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hash sampling is reproducible and roughly proportional") {
    val df = (1 to 2000).toDF("id")
    val a = Sampling.hashSample(df, "id", 64).as[Int].collect().toSet
    val b = Sampling.hashSample(df, "id", 64).as[Int].collect().toSet
    assert(a == b) // stable across runs
    assert(math.abs(a.size - 500) < 120, s"got ${a.size}, expected ≈500")
    // nested property: a smaller rate selects a subset of a larger one
    val smaller = Sampling.hashSample(df, "id", 16).as[Int].collect().toSet
    assert(smaller.subsetOf(a))
  }

  test("train/val split is a disjoint cover") {
    val df = (1 to 500).toDF("id")
    val (train, valSet) = Sampling.trainValSplit(df, "id", 32)
    val t = train.as[Int].collect().toSet
    val v = valSet.as[Int].collect().toSet
    assert((t & v).isEmpty && (t | v).size == 500)
  }

  test("mix unions per-source samples") {
    val a = (1 to 1000).toDF("id")
    val b = (1001 to 2000).toDF("id")
    val mixed = Sampling.mix(Seq((a, "id", 256), (b, "id", 26)))
    val n = mixed.count()
    assert(n > 1000 && n < 1250) // all of a + ~10% of b
  }

  test("stratifiedSample: per-stratum rates, default applies to unknown strata") {
    val df = (1 to 900).map(i => (i, Seq("en", "fr", "misc")(i % 3)))
      .toDF("id", "lang")
    val kept = Sampling.stratifiedSample(df, "id", "lang",
      rates = Map("en" -> 256, "fr" -> 64), defaultRate = 0)
      .select("id", "lang").as[(Int, String)].collect()
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang.getOrElse("en", 0) == 300)            // rate 256/256: all
    assert(!byLang.contains("misc"))                    // default 0: none
    val fr = byLang.getOrElse("fr", 0)
    assert(fr > 30 && fr < 120, s"fr kept $fr, expected ≈75") // ~64/256
    // same stable bucket as hashSample: fr selection is a hash subset
    val frIds = kept.filter(_._2 == "fr").map(_._1).toSet
    val viaHash = Sampling.hashSample(df.filter($"lang" === "fr"), "id", 64)
      .select("id").as[Int].collect().toSet
    assert(frIds == viaHash)
  }

  test("temperatureMix: alpha=1 keeps the natural mix, alpha<1 flattens toward uniform") {
    val df = ((1 to 900).map(i => (i, "big")) ++ (901 to 1000).map(i => (i, "small")))
      .toDF("id", "lang")
    // alpha=1: every rate is 256 → nothing dropped
    val natural = Sampling.temperatureMix(df, "id", "lang", alpha = 1.0)
    assert(natural.count() == 1000)
    // alpha=0.5: small stratum keeps all, big is downsampled by (9)^-0.5 ≈ 0.333
    val mixed = Sampling.temperatureMix(df, "id", "lang", alpha = 0.5)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(mixed("small") == 100)
    // rate = floor(256/3 + 0.5) = 85 of 256 ≈ 1/3 of 900 = 300 (hash noise band)
    assert(math.abs(mixed("big") - 300) < 80, s"got ${mixed("big")}")
    // reproducible: same call → identical selection
    val again = Sampling.temperatureMix(df, "id", "lang", alpha = 0.5)
      .agg(sum("id")).as[Long].head()
    val first = Sampling.temperatureMix(df, "id", "lang", alpha = 0.5)
      .agg(sum("id")).as[Long].head()
    assert(again == first)
  }

  test("slidingChunks: full coverage, overlap, short tail, one chunk for short docs") {
    import graft.ops.Chunking
    val df = Seq(
      (1L, (1 to 11).map(i => s"w$i").mkString(" ")), // 11 toks: starts 0,4,8
      (2L, "a b c")).toDF("doc_id", "text")           // 3 toks: one chunk
    val out = Chunking.slidingChunks(df, "doc_id", "text", window = 6, stride = 4)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, "w1 w2 w3 w4 w5 w6", 6L),
      (1L, 1L, "w5 w6 w7 w8 w9 w10", 6L),
      (1L, 2L, "w9 w10 w11", 3L),
      (2L, 0L, "a b c", 3L)))
  }

  test("shardShuffle: deterministic permutation, dense per-shard positions") {
    val df = (1 to 400).toDF("id")
    def run() = Sampling.shardShuffle(df, "id", "seedA", 4)
      .select("id", "shard", "pos").as[(Int, Int, Long)].collect().sortBy(_._1)
    val a = run()
    assert(a.sameElements(run())) // reproducible across runs
    // every shard's positions are exactly 1..n (dense, no gaps/dupes)
    a.groupBy(_._2).foreach { case (_, rows) =>
      val ps = rows.map(_._3).sorted
      assert(ps.sameElements(1L to ps.length))
    }
    assert(a.map(_._2).distinct.length == 4)
    // a different seed yields a different permutation
    val b = Sampling.shardShuffle(df, "id", "seedB", 4)
      .select("id", "shard", "pos").as[(Int, Int, Long)].collect().sortBy(_._1)
    assert(!a.map(r => (r._2, r._3)).sameElements(b.map(r => (r._2, r._3))))
  }

  test("packBins: contiguous fill, exclusive cumsum binning, oversize flag") {
    val docs = Seq(
      (1L, 200L), (2L, 200L), (3L, 200L), // third doc spills past 512
      (4L, 900L),                         // longer than capacity: flagged
      (5L, 100L))
      .toDF("doc_id", "n_tokens").withColumn("shard", lit(0L))
    val packed = Sampling.packBins(docs, "n_tokens", 512, "shard", "doc_id")
      .select("doc_id", "bin", "oversize")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    // exclusive cumsum 0,200,400,600,1500 → bins 0,0,0,1,2
    assert(packed.map(_._2) == Seq(0L, 0L, 0L, 1L, 2L))
    assert(packed.map(_._3) == Seq(false, false, false, true, false))
  }

  test("zInterleave: known bit patterns interleave exactly") {
    import graft.ops.Layout
    // x = 0b101, y = 0b011 → z bits: x at even, y at odd positions
    // = 1(0) 1(1) 0(2) 1(3) 1(4) 0(5) = 0b011011 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zInterleave(col("x"), col("y"), 8)).as[Long].head()
    assert(z == 27L)
  }

  test("clusterByZ tightens per-file bounds on BOTH dimensions vs single-column sort") {
    import graft.ops.Layout
    val ev = Tables(spark, sf).events.select(col("event_id"), col("value"), col("user_id"))
    val files = 8
    def spreads(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      import org.apache.spark.sql.functions.spark_partition_id
      val rows = df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max(col("value")) - min(col("value"))).as("vs"),
          (max(col("user_id")) - min(col("user_id"))).as("us"))
        .agg(avg(col("vs")), avg(col("us"))).collect()(0)
      (rows.getDouble(0), rows.getDouble(1))
    }
    val (vz, uz) = spreads(Layout.clusterByZ(ev, "value", "user_id", files))
    val (vs, us) = spreads(ev.repartitionByRange(files, col("value")))
    // value-only sort: value spread tiny, user spread ≈ full range.
    // z-order: BOTH spreads well below the full range (the point of the
    // layout: min/max file stats prune on either column)
    val fullU = ev.agg(max(col("user_id")) - min(col("user_id"))).collect()(0).getLong(0).toDouble
    val fullV = ev.agg(max(col("value")) - min(col("value"))).collect()(0).getDouble(0)
    assert(us > 0.9 * fullU, "sanity: single-column sort scatters the other dim")
    assert(uz < 0.6 * fullU, s"z-order user spread $uz vs full $fullU")
    assert(vz < 0.6 * fullV, s"z-order value spread $vz vs full $fullV")
  }

  test("ringNegatives: deterministic, self-free, k per anchor, seed re-draws") {
    val df = (1L to 200L).toDF("doc_id")
    def draw(seed: String) =
      Sampling.ringNegatives(df, "doc_id", k = 2, seed = seed, numBuckets = 4)
        .as[(Long, Int, Long)].collect().toSet
    val a = draw("s1")
    assert(a == draw("s1"), "same seed must reproduce the draw exactly")
    assert(a != draw("s2"), "a new seed must re-draw")
    assert(a.forall { case (anchor, _, neg) => anchor != neg }, "no self-negatives")
    // 4 buckets over 200 docs: every bucket has > k members, so every
    // anchor gets exactly k distinct negatives
    val perAnchor = a.groupBy(_._1).map { case (_, s) => s.map(_._3).size }
    assert(perAnchor.size == 200 && perAnchor.forall(_ == 2))
  }

  test("leakageSafeSplit: duplicate content never straddles the split") {
    // 50 distinct texts, each planted 3 times under different ids
    val docs = (1 to 150).map(i => (i.toLong, s"content ${i % 50}"))
      .toDF("doc_id", "text")
    val split = Sampling.leakageSafeSplit(docs, md5(col("text")), 64)
    val straddling = split.groupBy(col("text"))
      .agg(countDistinct(col("split")).as("sides"))
      .filter(col("sides") > 1).count()
    assert(straddling == 0L)
    // both sides populated (64/256 ≈ a quarter of 50 groups lands in val)
    val sides = split.select("split").distinct().as[String].collect().toSet
    assert(sides == Set("train", "val"))
    // near-dup variant: split on the CLUSTER id from the near-dup graph —
    // cluster members stay together even when their text hashes differ
    val ids = docs.select(col("doc_id").as("id"))
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cl = graft.dedup.Dedup.clusters(ids, pairs)
    val byCluster = docs.join(cl, docs("doc_id") === cl("id"))
    val clSplit = Sampling.leakageSafeSplit(byCluster, col("cluster"), 64)
    val clStraddle = clSplit.groupBy(col("cluster"))
      .agg(countDistinct(col("split")).as("sides"))
      .filter(col("sides") > 1).count()
    assert(clStraddle == 0L)
  }

  test("hdr quantiles: exact on small values, rank-exact bucket, mergeable") {
    import graft.ops.Quantiles
    // values < 2^(subBits+1) = 16 are exact buckets: quantiles are the
    // true order statistics
    val small = (1 to 100).flatMap(i => Seq(i % 10 + 1L)).toDF("v")
      .withColumn("g", lit("a"))
    val qs = Quantiles.quantiles(small, col("v"), Seq(col("g")), Seq(0.5, 1.0), 3)
      .as[(String, Double, Long)].collect().map(t => t._2 -> t._3).toMap
    assert(qs(0.5) == 5L && qs(1.0) == 10L)
    // estimate is the lower bound of the bucket holding rank ceil(qN):
    // within a factor (1 + 2^-3) below the true quantile, never above
    val wide = (1 to 10000).map(_.toLong).toDF("v").withColumn("g", lit("a"))
    val est = Quantiles.quantiles(wide, col("v"), Seq(col("g")), Seq(0.9), 3)
      .as[(String, Double, Long)].collect().head._3
    assert(est <= 9000L && est.toDouble >= 9000.0 / (1.0 + 1.0 / 8.0) - 1,
      s"p90 estimate $est out of the relative-error band")
    // mergeable: sum of two halves' sketches == sketch of the union
    val h1 = (1 to 5000).map(_.toLong).toDF("v")
    val h2 = (5001 to 10000).map(_.toLong).toDF("v")
    val merged = Quantiles.sketch(h1, col("v"), Nil, 3)
      .unionByName(Quantiles.sketch(h2, col("v"), Nil, 3))
      .groupBy(col("bucket")).agg(sum(col("n")).as("n"))
    val direct = Quantiles.sketch(h1.unionByName(h2), col("v"), Nil, 3)
    assert(merged.as[(Long, Long)].collect().toSet ==
      direct.as[(Long, Long)].collect().toSet)
  }

  test("equiDepthBins: near-uniform depths on uniform data, exact min/max edges") {
    import graft.ops.Quantiles
    val df = (1 to 10000).map(_.toLong).toDF("v").withColumn("g", lit("a"))
    val bins = Quantiles.equiDepthBins(df, col("v"), Seq("g"), nBins = 10,
        subBits = 8)
      .orderBy("bin")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(bins.map(_._2) == (0L to 9L), s"bins: ${bins.map(_._2)}")
    assert(bins.map(_._3).sum == 10000L)
    // equi-depth: every decile within the sketch's relative error of 1000
    assert(bins.forall(b => b._3 > 700 && b._3 < 1300),
      s"depths: ${bins.map(_._3)}")
    // bins tile the domain: consecutive (v_min, v_max) ranges abut
    assert(bins.head._4 == 1L && bins.last._5 == 10000L)
    assert(bins.sliding(2).forall { case Seq(a, b) => b._4 == a._5 + 1 })
  }

  test("minKDistinct: dedups, caps at k, merges across partitions") {
    import graft.plans.MinKDistinct.minKDistinct
    // 3,1,1,7,5,9 over 3 partitions; k=3 → [1,3,5] (the dup 1 one slot)
    val df = Seq(3L, 1L, 1L, 7L, 5L, 9L).toDF("v").repartition(3)
    val got = df.agg(minKDistinct(col("v"), 3).as("ks"))
      .as[Seq[Long]].collect().head
    assert(got == Seq(1L, 3L, 5L))
  }

  test("kmv distinctEstimate: exact below k, within error band above") {
    import graft.ops.Kmv
    val few = (1 to 40).map(i => ("a", i.toLong)).toDF("g", "k")
    val e1 = Kmv.distinctEstimate(few, col("k"), Seq(col("g")), k = 64)
      .as[(String, Long, Long)].collect().head
    assert(e1 == (("a", 40L, 40L))) // degrades to exact counting
    val many = (1 to 20000).map(i => ("b", (i % 5000).toLong)).toDF("g", "k")
    val e2 = Kmv.distinctEstimate(many, col("k"), Seq(col("g")), k = 64)
      .as[(String, Long, Long)].collect().head
    // KMV standard error ~ 1/sqrt(k-2) ≈ 12.7%; allow 4 sigma
    assert(e2._2 == 64L && e2._3 > 2500 && e2._3 < 7500,
      s"estimate ${e2._3} for true 5000")
  }

  test("applyMixture: uniform alpha over balanced domains is the identity resample") {
    // 4 equal domains, alpha=0.25 → r = 0.25·40/10 = 1.0 exactly: every
    // row exactly once, copy index 1
    val df = (1 to 40).map(i => (i.toLong, s"d${i % 4}")).toDF("id", "dom")
    val out = Sampling.applyMixture(df, "id", "dom", lit(0.25))
    assert(out.count() == 40)
    assert(out.agg(max(col("mix_copy"))).head().getInt(0) == 1)
  }

  test("applyMixture: overweighted domain replicates, underweighted shrinks, total ≈ N") {
    val df = (1 to 400).map(i => (i.toLong, s"d${i % 4}")).toDF("id", "dom")
    // d0 gets 50% of the mixture (r=2.0 → exact 2 copies), the rest share
    val alpha = when(col("dom") === "d0", 0.5).otherwise(lit(0.5 / 3))
    val out = Sampling.applyMixture(df, "id", "dom", alpha)
    val byDom = out.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom("d0") == 200L) // r exactly 2.0: deterministic replication
    // others: r = (0.5/3)·400/100 = 0.666… → hash-kept ~2/3 of 100 each
    Seq("d1", "d2", "d3").foreach { d =>
      assert(byDom(d) > 40 && byDom(d) < 90, s"$d -> ${byDom(d)}")
    }
    // mixture preserves N in expectation (alphas sum to 1)
    val total = byDom.values.sum
    assert(total > 340 && total < 460, s"total $total")
    // deterministic: identical resample on a second run
    val out2 = Sampling.applyMixture(df, "id", "dom", alpha)
    assert(out.exceptAll(out2).isEmpty && out2.exceptAll(out).isEmpty)
  }
}
