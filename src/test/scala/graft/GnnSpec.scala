package graft

import graft.sim.Gnn
import org.apache.spark.sql.functions._

class GnnSpec extends SparkSpec {
  import spark.implicits._

  test("sageMeanLayer: self ⧺ neighbor-mean, L2-normalized") {
    // node 1 ~ {2, 3}; hand computation:
    //   self(1) = (1, 0); nmean(1) = ((0+2)/2, (2+0)/2) = (1, 1)
    //   h(1) = (1, 0, 1, 1) / √3
    val nodes = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(0f, 2f)), (3L, Seq(2f, 0f)))
      .toDF("id", "vec")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
      .toDF("src", "dst")
    val got = Gnn.sageMeanLayer(nodes, edges, "id", "vec")
      .as[(Long, Seq[Double])].collect().toMap
    val s3 = math.sqrt(3.0)
    val want1 = Seq(1 / s3, 0.0, 1 / s3, 1 / s3)
    got(1L).zip(want1).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-12, s"node 1: $g vs $w")
    }
    // node 2's only neighbor is 1 → nmean = (1, 0); h = (0,2,1,0)/√5
    val s5 = math.sqrt(5.0)
    got(2L).zip(Seq(0.0, 2 / s5, 1 / s5, 0.0)).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-12, s"node 2: $g vs $w")
    }
  }

  test("sageMeanLayer: degree-1000 unit-scale node does not overflow the norm") {
    // Quantized components reach 1e6·cnt = 1e9 on the self half; their
    // squares are 1e18 each, and 32 of them (d=16, both halves) sum to
    // ~3.2e19 > Long.MaxValue — a long accumulator wraps silently. The
    // Double accumulator must produce the exact unit vector 1/√32.
    val d = 16
    val hub = Seq((0L, Seq.fill(d)(1f))).toDF("id", "vec")
    val leaves = (1L to 1000L).map(i => (i, Seq.fill(d)(1f))).toDF("id", "vec")
    val nodes = hub.union(leaves)
    val edges = (1L to 1000L).map(i => (0L, i)).toDF("src", "dst")
    val h0 = Gnn.sageMeanLayer(nodes, edges, "id", "vec")
      .filter(col("id") === 0L)
      .as[(Long, Seq[Double])].head()._2
    val want = 1.0 / math.sqrt(2.0 * d)
    assert(h0.size == 2 * d)
    h0.foreach(v => assert(math.abs(v - want) < 1e-12,
      s"$v vs $want — a wrapped long norm would corrupt this"))
  }

  test("sageMeanLayer: isolated node keeps a zero neighbor half") {
    val nodes = Seq((1L, Seq(3f, 4f)), (9L, Seq(0f, 5f))).toDF("id", "vec")
    val edges = Seq((1L, 9L)).toDF("src", "dst") // 9 has no out-edge
    val got = Gnn.sageMeanLayer(nodes, edges, "id", "vec")
      .as[(Long, Seq[Double])].collect().toMap
    assert(got.keySet == Set(1L, 9L), "isolated node must stay in output")
    // node 9: h = (0, 5, 0, 0)/5 = (0, 1, 0, 0)
    got(9L).zip(Seq(0.0, 1.0, 0.0, 0.0)).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-12)
    }
    // output width is always 2 × input dim
    assert(got.values.forall(_.size == 4))
  }
}
