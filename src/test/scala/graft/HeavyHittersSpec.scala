package graft

import graft.ops.HeavyHitters
import graft.plans.MgSketch.mgSketch
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Skewed synthetic stream: key i repeated ~1000/i times (Zipf-ish),
    * plus a long uniform tail of distinct keys. */
  private def zipfish: Seq[Long] = {
    val heavy = (1 to 20).flatMap(i => Seq.fill(1000 / i)(i.toLong))
    val tail = (1000L to 1800L)
    new scala.util.Random(7).shuffle((heavy ++ tail).toVector)
  }

  test("MG sketch guarantee: every key over n/(k+1) survives, error bounded") {
    val data = zipfish
    val n = data.size
    val k = 32
    val sketch = data.toDF("key")
      .agg(mgSketch($"key", k).as("s"))
      .select(explode($"s").as("c"))
      .select($"c.id", $"c.est").as[(Long, Long)].collect().toMap
    assert(sketch.size <= k)
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n.toDouble / (k + 1)
    truth.filter(_._2 > bound).keys.foreach { key =>
      assert(sketch.contains(key), s"guaranteed key $key missing (count ${truth(key)} > $bound)")
    }
    sketch.foreach { case (key, est) =>
      val t = truth(key)
      assert(est <= t && est >= t - bound, s"key $key: est $est outside [${t - bound}, $t]")
    }
  }

  test("sketch is partition-invariant enough: guarantee holds at 1 and 16 partitions") {
    val data = zipfish
    for (parts <- Seq(1, 16)) {
      val got = data.toDF("key").repartition(parts)
        .agg(mgSketch($"key", 32).as("s"))
        .select(explode($"s").as("c")).select($"c.id")
        .as[Long].collect().toSet
      val truth = data.groupBy(identity).view.mapValues(_.size).toMap
      val bound = data.size / 33.0
      truth.filter(_._2 > bound).keys.foreach(key =>
        assert(got.contains(key), s"parts=$parts lost guaranteed key $key"))
    }
  }

  test("HeavyHitters.exact equals brute-force groupBy/filter") {
    val data = zipfish
    val df = data.toDF("key")
    val phi = 0.02
    val got = HeavyHitters.exact(df, "key", phi, k = 64)
      .as[(Long, Long)].collect().toMap
    val want = data.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 > phi * data.size).toMap
    assert(got == want && want.nonEmpty)
  }

  test("minimal capacity k=ceil(1/phi) is still exact (tight guarantee)") {
    val data = zipfish
    val phi = 0.03
    val got = HeavyHitters.exact(data.toDF("key"), "key", phi)
      .as[(Long, Long)].collect().toMap
    val want = data.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 > phi * data.size).toMap
    assert(got == want)
  }

  test("mg_sketch declares LongType input: ints coerce, bad types fail analysis") {
    import graft.plans.MgSketch.mgSketch
    import spark.implicits._
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "s")
    // int column: implicit upcast in analysis (no runtime ClassCastException)
    val viaInt = df.agg(mgSketch(col("k"), 4).as("sk"))
      .selectExpr("size(sk)").as[Int].head()
    assert(viaInt == 2)
    // array column: not coercible to long → readable ANALYSIS error,
    // not a ClassCastException inside the aggregate
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(mgSketch(array(col("k")), 4)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("type"))
  }

  test("plan: candidate recount join is broadcast; corpus never shuffled") {
    val keyed = Tables(spark, sf).events
      .select(floor(col("value")).cast("long").as("vkey"))
    val plan = HeavyHitters.exact(keyed, "vkey", 0.01, 128)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"recount join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled for recount:\n$plan")
  }
}
