package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

class HilbertSpec extends SparkSpec {
  import spark.implicits._

  /** Reference xy2d (Hamilton's curve, the canonical loop form) —
    * written independently of the column unroll. */
  private def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("hilbertIndex matches the reference xy2d on a full 8x8 grid and samples") {
    val bits = 3
    val pts = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val got = pts.toDF("x", "y")
      .withColumn("h", Layout.hilbertIndex(col("x"), col("y"), bits))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == xy2d(bits, x, y), s"($x,$y)")
    }
    // a 16-bit sample too (the production width)
    val big = Seq((0L, 0L), (65535L, 65535L), (12345L, 54321L), (40000L, 1L))
    val got16 = big.toDF("x", "y")
      .withColumn("h", Layout.hilbertIndex(col("x"), col("y"), 16))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    big.foreach { case (x, y) =>
      assert(got16((x, y)) == xy2d(16, x, y), s"16-bit ($x,$y)")
    }
  }

  test("native HilbertIndex ≡ HOF fold ≡ reference, on random 16-bit points") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val rows = pts.toDF("x", "y")
      .withColumn("hf", Layout.hilbertIndex(col("x"), col("y"), 16))
      .withColumn("hn", graft.plans.LayoutNative.hilbertIndex(col("x"), col("y"), 16))
      .as[(Long, Long, Long, Long)].collect()
    rows.foreach { case (x, y, hf, hn) =>
      assert(hf == hn, s"fold vs native at ($x,$y)")
      assert(hn == xy2d(16, x, y), s"native vs reference at ($x,$y)")
    }
  }

  test("data skipping: Hilbert file boxes are tighter than Z-order on real events") {
    // cluster events by (value, user_id) both ways, cut into 32 'files'
    // by curve rank, and compare the per-file min/max bounding boxes —
    // the statistic a reader's skip decision actually consults. The
    // Hilbert curve's no-diagonal-jumps property must shrink the total
    // box area vs the Z-curve on identical data.
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, sf).events
      .select(col("event_id"), col("value"), col("user_id"))
    def totalBoxArea(indexed: org.apache.spark.sql.DataFrame,
        idxCol: String): Double = {
      val w = Window.orderBy(col(idxCol), col("event_id"))
      indexed
        .withColumn("file", ntile(32).over(w))
        .groupBy(col("file"))
        .agg((max(col("value")) - min(col("value"))).as("dv"),
          (max(col("user_id")) - min(col("user_id"))).as("du"))
        .agg(sum(col("dv") * col("du"))).head().getDouble(0)
    }
    def filesTouched(indexed: org.apache.spark.sql.DataFrame,
        idxCol: String, dim: String, lo: Double, hi: Double): Long = {
      val w = Window.orderBy(col(idxCol), col("event_id"))
      indexed
        .withColumn("file", ntile(32).over(w))
        .groupBy(col("file"))
        .agg(min(col(dim)).as("mn"), max(col(dim)).as("mx"))
        .filter(col("mx") >= lo && col("mn") <= hi)
        .count()
    }
    val zi = graft.ops.Layout.withZValue(ev, "value", "user_id", 16)
    val hi_ = graft.ops.Layout.withHilbertValue(ev, "value", "user_id", 16)
    val z = totalBoxArea(zi, "z")
    val h = totalBoxArea(hi_, "h")
    assert(h < z, s"hilbert boxes ($h) must beat z-order boxes ($z)")
    // balanced skipping: for a narrow USER-dimension probe, both curves
    // must touch far fewer files than a value-only sort (whose files all
    // span the full user range); a total-area comparison against the
    // 1-D sort is misleading (dv≈0 × full-du products can be tiny)
    val vSorted = ev.withColumn("v1", col("value"))
    val probeLo = 10.0; val probeHi = 60.0 // narrow user_id slice
    val hTouch = filesTouched(hi_, "h", "user_id", probeLo, probeHi)
    val zTouch = filesTouched(zi, "z", "user_id", probeLo, probeHi)
    val sTouch = filesTouched(vSorted, "v1", "user_id", probeLo, probeHi)
    assert(hTouch < sTouch && zTouch < sTouch,
      s"curve layouts must skip files on the non-sorted dimension: " +
        s"hilbert=$hTouch z=$zTouch value-sort=$sTouch of 32")
  }

  test("hilbert continuity: consecutive indexes are adjacent cells (Z-order is not)") {
    val bits = 3
    val pts = for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)
    val byH = pts.map { case (x, y) => (xy2d(bits, x, y), x, y) }
      .sortBy(_._1)
    // a space-filling curve: indexes are a permutation of 0..63 and each
    // step moves exactly one cell — the locality property Z lacks
    assert(byH.map(_._1) == (0L until 64L))
    byH.sliding(2).foreach { case Seq((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
  }
}
