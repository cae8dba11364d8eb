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
}
