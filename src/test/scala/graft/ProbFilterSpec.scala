package graft

import graft.ops.{Bloom, Cms}
import org.apache.spark.sql.functions._

class ProbFilterSpec extends SparkSpec {
  import spark.implicits._

  // ---- Count-Min -----------------------------------------------------

  test("cms estimate is never below the true count (one-sided error)") {
    val keys = (1 to 500).flatMap(i => Seq.fill(i % 7 + 1)(s"k$i"))
    val df = keys.toDF("k")
    val sk = Cms.sketch(df, col("k"))
    val exact = df.groupBy(col("k")).agg(count(lit(1)).as("exact"))
    val est = Cms.estimate(sk, exact, "k")
    val bad = est.filter(col("cms_est") < col("exact")).count()
    assert(bad == 0)
  }

  test("cms sketch is bounded at d x 256 rows and merge-invariant") {
    val df = (1 to 5000).map(i => s"k${i % 300}").toDF("k")
    val sk = Cms.sketch(df, col("k"))
    assert(sk.count() <= 4 * 256)
    // partition layout must not change a single counter (partial-agg
    // merge by + IS the CMS union)
    val sk7 = Cms.sketch(df.repartition(7), col("k"))
    assert(sk.except(sk7).isEmpty && sk7.except(sk).isEmpty)
  }

  test("cms point estimates are exact for keys with no bucket collisions") {
    // tiny universe: 4 keys can't collide with anything else in 256
    // buckets unless md5 happens to collide — then min-over-4-lanes
    // still isolates them with overwhelming probability
    val df = Seq.fill(10)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val sk = Cms.sketch(df.toDF("k"), col("k"))
    val got = Cms.estimate(sk, Seq("a", "b", "c", "zzz").toDF("k"), "k")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a") == 10 && got("b") == 3 && got("c") == 1)
    assert(got("zzz") == 0) // absent key, empty buckets read 0
  }

  // ---- Bloom ---------------------------------------------------------

  test("bloom has no false negatives and the two probe faces agree") {
    val members = (1L to 800L).map(_ * 13).toDF("k")
    val bits = Bloom.bits(members, col("k")).cache()
    val probes = (1L to 12000L).toDF("k")
    val rel = Bloom.probe(bits, probes, "k")
    // no false negative: every member probe is a hit
    val fn = rel.join(members.withColumnRenamed("k", "mk"),
        col("k") === col("mk"))
      .filter(!col("bloom_hit")).count()
    assert(fn == 0)
    // packed scan-stage form returns the identical verdict row for row
    val packed = probes.select(col("k"),
      Bloom.packedProbe(bits, col("k")).as("packed_hit"))
    val disagree = rel.join(packed, "k")
      .filter(col("bloom_hit") =!= col("packed_hit")).count()
    assert(disagree == 0)
    // false positives exist in principle but must be rare at this load
    // (n=800, m=65536, k=3 -> fp ~ 4e-5); allow a small absolute count
    val fp = rel.join(members.withColumnRenamed("k", "mk"),
        col("k") === col("mk"), "left_anti")
      .filter(col("bloom_hit")).count()
    assert(fp <= 5, s"fp=$fp")
  }

  test("bloom bits relation is the distinct lane-position set (bounded)") {
    val members = (1L to 100L).toDF("k")
    val bits = Bloom.bits(members, col("k"))
    val n = bits.count()
    assert(n <= 300 && n > 250) // 3 lanes x 100 keys, minus collisions
    assert(bits.distinct().count() == n)
  }
}
