package graft

import graft.ops.Hll
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  test("hll estimate lands within 3 standard errors (raw regime)") {
    // 5000 distinct keys, m=256 → stderr ≈ 6.5%; 3σ ≈ 20%
    val df = (1L to 5000L).toDF("k")
    val est = Hll.hllDistinct(df, col("k"), Nil).as[Double].head()
    assert(math.abs(est - 5000) / 5000 < 0.20, s"estimate $est")
  }

  test("linear-counting branch is accurate at small cardinality") {
    val df = (1L to 100L).toDF("k")
    val est = Hll.hllDistinct(df, col("k"), Nil).as[Double].head()
    assert(math.abs(est - 100) / 100 < 0.15, s"estimate $est")
  }

  test("estimate is duplication- and partitioning-invariant (exactly)") {
    val base = (1L to 3000L).toDF("k")
    val dup = base.unionAll(base).unionAll(base) // same key set, 3× rows
    val e1 = Hll.hllDistinct(base, col("k"), Nil).as[Double].head()
    val e2 = Hll.hllDistinct(dup.repartition(7), col("k"), Nil)
      .as[Double].head()
    // registers are a pure function of the key SET and max-merge is
    // order-free integer math — bit-equal, not just close
    assert(e1 == e2)
  }

  test("grouped estimates are computed independently per group") {
    val df = ((1L to 2000L).map(k => ("a", k)) ++
      (1L to 700L).map(k => ("b", k + 100000))).toDF("g", "k")
    val got = Hll.hllDistinct(df, col("k"), Seq(col("g")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("a") - 2000) / 2000 < 0.20, s"a=${got("a")}")
    assert(math.abs(got("b") - 700) / 700 < 0.20, s"b=${got("b")}")
  }
}
