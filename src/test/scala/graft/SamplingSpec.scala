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
}
