package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** Exact-recomputation checks for the robust-stats / sampling wave:
  * each query runs on sf0.001 and is re-derived driver-side from the raw
  * rows (independent Scala implementation, not the Spark plan). */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("weightedSample: deterministic, k rows, weight-tilted") {
    val df = (1 to 1000).map(i => (i, if (i <= 200) 50.0 else 1.0))
      .toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", "w", 100)
      .select("id").as[Int].collect()
    val b = Sampling.weightedSample(df, "id", "w", 100)
      .select("id").as[Int].collect()
    assert(a.toSeq == b.toSeq, "draw must be stable across runs")
    assert(a.length == 100)
    // 200 heavy rows at weight 50 vs 800 at weight 1 → heavy mass is
    // 10000/10800 ≈ 93%; the sample should be overwhelmingly heavy.
    val heavy = a.count(_ <= 200)
    assert(heavy > 70, s"expected heavy-weight dominance, got $heavy/100")
    // scale invariance: multiplying every weight by a constant divides
    // every score by it — the selected set and order cannot change
    val scaled = Sampling.weightedSample(
        df.withColumn("w", col("w") * 7.0), "id", "w", 100)
      .select("id").as[Int].collect()
    assert(scaled.toSeq == a.toSeq)
  }

  test("q_ffill: carries the last purchase value, -1 before any purchase") {
    val rows = Queries.qFfill.run(spark, sf)
      .select("user_id", "event_id", "last_purchase")
      .as[(Long, Long, Double)].collect()
    val raw = Tables(spark, sf).events
      .select("user_id", "event_id", "event_type", "value")
      .as[(Long, Long, String, Double)].collect()
    val order = Tables(spark, sf).events
      .select("user_id", "event_id", "ts")
      .as[(Long, Long, java.sql.Timestamp)].collect()
      .map { case (u, e, t) => (u, e) -> t }.toMap
    val expected = raw
      .groupBy(_._1)
      .toSeq
      .flatMap { case (u, evs) =>
        var last = -1.0
        evs.sortBy { case (_, e, _, _) => (order((u, e)), e) }
          .map { case (_, e, typ, v) =>
            if (typ == "purchase") last = v
            (u, e) -> math.floor(last * 10000 + 0.5) / 10000
          }
          .toSeq
      }
      .toMap
    assert(rows.length == raw.length)
    rows.foreach { case (u, e, got) =>
      val want = expected((u, e))
      assert(math.abs(got - want) < 1e-9, s"user $u event $e: $got != $want")
    }
  }

  test("q_outliers: Tukey fences match a driver-side recomputation") {
    val got = Queries.qOutliers.run(spark, sf)
      .select("event_type", "n_total", "n_outliers")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val raw = Tables(spark, sf).events
      .select("event_type", "value").as[(String, Double)].collect()
    def quantile(xs: Array[Double], q: Double): Double = {
      val s = xs.sorted
      val pos = q * (s.length - 1)
      val lo = pos.toInt
      val g = pos - lo
      if (lo + 1 < s.length) s(lo) * (1 - g) + s(lo + 1) * g else s(lo)
    }
    raw.groupBy(_._1).foreach { case (typ, rows) =>
      val vs = rows.map(_._2)
      val (q1, q3) = (quantile(vs, 0.25), quantile(vs, 0.75))
      def r4d(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (lo, hi) = (r4d(q1 - (q3 - q1) * 1.5), r4d(q3 + (q3 - q1) * 1.5))
      val nOut = vs.count(v => v < lo || v > hi).toLong
      assert(got(typ) == ((vs.length.toLong, nOut)),
        s"$typ: got ${got(typ)}, want (${vs.length}, $nOut)")
    }
  }

  test("q_regression: OLS slope/intercept recompute from raw moments") {
    val got = Queries.qRegression.run(spark, sf)
      .select("l_returnflag", "slope", "intercept")
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val raw = Tables(spark, sf).lineitem
      .select("l_returnflag", "l_quantity", "l_extendedprice")
      .as[(String, Double, Double)].collect()
    raw.groupBy(_._1).foreach { case (flag, rows) =>
      val xs = rows.map(_._2); val ys = rows.map(_._3); val n = rows.length
      val mx = xs.sum / n; val my = ys.sum / n
      val sxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val sxx = xs.map(x => (x - mx) * (x - mx)).sum
      val slope = sxy / sxx
      val intercept = my - slope * mx
      val (gs, gi) = got(flag)
      assert(math.abs(gs - slope) < 1e-3, s"$flag slope $gs vs $slope")
      assert(math.abs(gi - intercept) < 1e-2, s"$flag intercept $gi vs $intercept")
    }
  }

  test("q_ab_test: Welch t recomputes; parity split is near-null effect") {
    val got = Queries.qAbTest.run(spark, sf)
      .select("event_type", "n_a", "n_b", "t_stat")
      .as[(String, Long, Long, Double)].collect()
    assert(got.length == 5)
    val raw = Tables(spark, sf).events
      .select("event_type", "user_id", "value")
      .as[(String, Long, Double)].collect()
    got.foreach { case (typ, nA, nB, t) =>
      val vs = raw.filter(_._1 == typ)
      val a = vs.filter(_._2 % 2 == 0).map(_._3)
      val b = vs.filter(_._2 % 2 == 1).map(_._3)
      assert(a.length == nA && b.length == nB)
      def meanVar(x: Array[Double]) = {
        val m = x.sum / x.length
        (m, x.map(v => (v - m) * (v - m)).sum / (x.length - 1))
      }
      val (ma, va) = meanVar(a); val (mb, vb) = meanVar(b)
      val tExp = (ma - mb) / math.sqrt(va / a.length + vb / b.length)
      assert(math.abs(t - tExp) < 1e-3, s"$typ: t=$t vs $tExp")
    }
  }

  test("q_entropy: KL nonnegative, entropy bounded by ln(vocab)") {
    val rows = TextQueries.qEntropy.run(spark, sf)
      .select("source", "n_tokens", "entropy", "kl_vs_corpus")
      .as[(String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, n, h, kl) =>
      assert(h >= 0 && kl >= -1e-9, s"$src: H=$h KL=$kl")
      assert(h <= math.log(n.toDouble) + 1e-9,
        s"$src: entropy $h exceeds ln(n_tokens=$n)")
    }
  }

  test("q_scd2: intervals chain per key, exactly one current row") {
    val rows = Queries.qScd2.run(spark, sf)
      .select("user_id", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, Long, Boolean)].collect()
    rows.groupBy(_._1).foreach { case (u, rs) =>
      assert(rs.count(_._4) == 1, s"user $u: expected exactly one current row")
      // order zero-length intervals (duplicate ts) before their closer and
      // the open row (-1) last — collect() order is not a sort
      val sorted = rs.sortBy { case (_, from, to, _) => (from, to == -1L, to) }
      sorted.sliding(2).foreach {
        case Array((_, _, to, _), (_, from, _, _)) =>
          assert(to == from, s"user $u: interval chain broken ($to != $from)")
        case _ =>
      }
      assert(sorted.last._3 == -1L, s"user $u: current row must be open-ended")
    }
  }

  test("q_rrf_fusion: docs in both shortlists outrank single-list docs at equal rank") {
    val out = TextQueries.qRrfFusion.run(spark, sf)
      .select("doc_id", "rrf_x1000").as[(Long, Double)].collect()
    assert(out.length == 15)
    // scores are within RRF bounds: one list gives at most 1000/61,
    // two lists at most 2000/61
    out.foreach { case (id, sc) =>
      assert(sc > 0 && sc <= 2000.0 / 61 + 1e-9, s"doc $id score $sc out of range")
    }
    // descending with doc_id tiebreak (deterministic presentation order)
    assert(out.sortBy { case (id, sc) => (-sc, id) }.toSeq == out.toSeq)
  }

  test("q_anomaly: every flagged row's trailing-window z recomputes") {
    val flagged = Queries.qAnomaly.run(spark, sf)
      .select("user_id", "event_id", "z").as[(Long, Long, Double)].collect()
    assert(flagged.nonEmpty, "sf0.001 should surface at least one anomaly")
    val raw = Tables(spark, sf).events
      .select("user_id", "event_id", "ts", "value")
      .as[(Long, Long, java.sql.Timestamp, Double)].collect()
      .groupBy(_._1).map { case (u, evs) =>
        u -> evs.sortBy { case (_, e, t, _) => (t, e) }
      }
    flagged.foreach { case (u, e, z) =>
      val series = raw(u)
      val i = series.indexWhere(_._2 == e)
      val window = series.slice(math.max(0, i - 19), i + 1).map(_._4)
      val mu = window.sum / window.length
      val sd = math.sqrt(
        window.map(v => (v - mu) * (v - mu)).sum / (window.length - 1))
      val zExp = BigDecimal((window.last - mu) / sd)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(z - zExp) < 1e-9, s"user $u event $e: z=$z, want $zExp")
      assert(math.abs(z) > 2.5)
    }
  }

  test("theilSen: outlier-resistant slope matches driver-side median of pair slopes") {
    // line v = 2t/hr with one wild outlier; TS ignores it, OLS would not
    val hourUs = 3.6e9.toLong
    val rows = (0 to 9).map { i =>
      val v = if (i == 5) 1000.0 else 2.0 * i
      (1L, new java.sql.Timestamp(i.toLong * hourUs / 1000), v)
    }
    val df = rows.toDF("user_id", "ts", "value")
    val got = graft.ops.Robust.theilSen(df, "user_id", "ts", "value")
      .as[(Long, Long, Long, Double)].collect().head
    // driver replay
    val pts = rows.map { case (_, ts, v) => (ts.getTime * 1000L, v) }
    val slopes = (for {
      i <- pts.indices; j <- pts.indices if pts(i)._1 < pts(j)._1
    } yield (pts(j)._2 - pts(i)._2) * 3.6e9 / (pts(j)._1 - pts(i)._1).toDouble)
      .sorted
    val m = (slopes(slopes.size / 2 - 1) + slopes(slopes.size / 2)) / 2
    val want = math.floor(m * 10000 + 0.5) / 10000
    assert(got == ((1L, 10L, 45L, want)), s"got $got want slope $want")
    assert(math.abs(want - 2.0) < 0.5, "median slope shrugs off the outlier")
  }

  test("winsorized: fences clip and trim as computed by hand") {
    // 0..9 plus outlier 1000; p10/p90 interpolated fences
    val vals = ((0 to 9).map(_.toDouble) :+ 1000.0)
    val df = vals.map(("a", _)).toDF("k", "v")
    val got = graft.ops.Robust.winsorized(df, "k", "v", 0.10, 0.90)
      .as[(String, Long, Double, Double, Double, Double, Double)]
      .collect().head
    val sorted = vals.sorted
    def q(p: Double): Double = {
      val pos = p * (sorted.size - 1); val lo = pos.toInt
      val f = pos - lo
      if (lo + 1 < sorted.size) sorted(lo) * (1 - f) + sorted(lo + 1) * f
      else sorted(lo)
    }
    def fl(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val (lo, hi) = (q(0.10), q(0.90))
    val wins = vals.map(v => math.min(math.max(v, lo), hi))
    val trim = vals.filter(v => v >= lo && v <= hi)
    assert(got._1 == "a" && got._2 == 11L)
    assert(got._3 == fl(lo) && got._4 == fl(hi))
    assert(got._6 == fl(wins.sum / wins.size), "winsorized mean")
    assert(got._7 == fl(trim.sum / trim.size), "trimmed mean")
    assert(got._6 < got._5, "clipping pulls the mean off the outlier")
  }

  test("bootstrapCi: brackets the true mean, scales with n, deterministic") {
    import graft.ops.Robust
    // two keys: tight (mean 50, small spread, n=400) and loose (n=40)
    val rnd = new scala.util.Random(11)
    val rows =
      (1 to 400).map(i => ("tight", 50.0 + rnd.nextGaussian(), i.toLong)) ++
      (1 to 40).map(i => ("loose", 50.0 + 10 * rnd.nextGaussian(), 1000L + i))
    val df = rows.toDF("k", "v", "id")
    val out = Robust.bootstrapCi(df, "k", "v", "id", b = 32)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val (nT, loT, hiT) = out("tight")
    val (nL, loL, hiL) = out("loose")
    assert(nT == 32L && nL == 32L)
    assert(loT < hiT && loL < hiL)
    // the CI must bracket the empirical mean of its own data
    val meanT = rows.filter(_._1 == "tight").map(_._2).sum / 400
    val meanL = rows.filter(_._1 == "loose").map(_._2).sum / 40
    assert(loT <= meanT && meanT <= hiT, s"tight CI [$loT,$hiT] vs $meanT")
    assert(loL <= meanL && meanL <= hiL, s"loose CI [$loL,$hiL] vs $meanL")
    // more data + less spread → tighter interval
    assert(hiT - loT < hiL - loL,
      s"tight width ${hiT - loT} !< loose width ${hiL - loL}")
    // md5 weights: identical across runs
    val again = Robust.bootstrapCi(df, "k", "v", "id", b = 32)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out == again)
  }
}
