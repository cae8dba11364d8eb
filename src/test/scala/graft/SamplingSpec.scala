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
}
