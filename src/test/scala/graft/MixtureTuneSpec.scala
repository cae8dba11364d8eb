package graft

import graft.dedup.Dedup
import graft.ops.Curation
import org.apache.spark.sql.functions._

/** Semantics of the round-13 training-mixture/tuning trio: logistic
  * quality-classifier step, DoReMi mixture reweighting, LSH S-curve
  * tuning. Each also carries a DuckDB oracle in the registry; these
  * specs pin the math the oracle can't state (descent, normalization,
  * monotonicity). */
class MixtureTuneSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables(spark, sf).documents

  test("logregStep: hand-checked gradient on a 2-row batch") {
    // rows: (y=1, x=[1,2]), (y=0, x=[1,0]); w0=[0,0] → p=0.5 both
    // grad = [((.5-1)+(.5-0))/2, ((.5-1)*2+0)/2] = [0, -0.5]
    val df = Seq((1.0, 2.0), (0.0, 0.0)).toDF("y", "x1")
    val out = Curation.logregStep(df,
        features = Seq(lit(1.0), col("x1")), label = col("y") === 1.0,
        w0 = Seq(0.0, 0.0), eta = 1.0)
      .orderBy("feature").collect()
    assert(out.map(_.getAs[Double]("grad")).toSeq == Seq(0.0, -0.5))
    assert(out.map(_.getAs[Double]("w_new")).toSeq == Seq(0.0, 0.5))
    // mean log-loss at p=0.5 is ln 2
    assert(math.abs(out.head.getAs[Double]("train_loss") - math.log(2)) < 1e-3)
  }

  test("logregStep: saturated sigmoid (|z| ≳ 745) keeps train_loss finite") {
    // x = ∓1e6 with w = 1 drives p to exactly 0.0 / 1.0 in double
    // precision; without the loss clamp log(p) / log(1−p) would poison
    // train_loss to ±Inf for the whole batch
    val df = Seq((1.0, -1e6), (0.0, 1e6)).toDF("y", "x1")
    val out = Curation.logregStep(df,
        features = Seq(col("x1")), label = col("y") === 1.0,
        w0 = Seq(1.0), eta = 0.1)
      .collect()
    val loss = out.head.getAs[Double]("train_loss")
    assert(java.lang.Double.isFinite(loss) && loss > 0, s"loss $loss")
    out.foreach { r =>
      assert(java.lang.Double.isFinite(r.getAs[Double]("grad")))
      assert(java.lang.Double.isFinite(r.getAs[Double]("w_new")))
    }
  }

  test("logregStep: a step from w0 reduces the training loss") {
    val nw = size(split(trim(col("text")), "\\s+")).cast("double")
    val feats = Seq(lit(1.0), log(lit(1.0) + col("n_chars")),
      nw / 10.0, col("n_chars") / (nw * 10.0))
    val w0 = Seq(-1.0, 0.2, -0.1, 0.05)
    val s1 = Curation.logregStep(docs, feats, col("lang") === "en", w0, eta = 0.05)
      .orderBy("feature").collect()
    val w1 = s1.map(_.getAs[Double]("w_new")).toSeq
    val s2 = Curation.logregStep(docs, feats, col("lang") === "en", w1, eta = 0.05)
      .collect()
    assert(s2.head.getAs[Double]("train_loss") <
      s1.head.getAs[Double]("train_loss"))
  }

  test("mixtureWeights: alphas normalize, and order follows domain loss") {
    val out = Curation.mixtureWeights(docs, "source",
      loss = log(lit(1.0) + col("n_chars")), eta = 5.0, smooth = 0.1).collect()
    val alphaSum = out.map(_.getAs[Double]("alpha")).sum
    assert(math.abs(alphaSum - 1.0) < 1e-2) // 4-decimal rounding × |D|
    // the max-loss domain carries the max alpha; every alpha ≥ smooth/D
    val byLoss = out.maxBy(_.getAs[Double]("domain_loss"))
    val byAlpha = out.maxBy(_.getAs[Double]("alpha"))
    assert(byLoss.getAs[String]("domain") == byAlpha.getAs[String]("domain"))
    val floor = 0.1 / out.length - 1e-4
    assert(out.forall(_.getAs[Double]("alpha") >= floor))
  }

  test("mixtureWeights: constant loss collapses to the uniform mixture") {
    val out = Curation.mixtureWeights(docs, "source",
      loss = lit(3.0), eta = 5.0, smooth = 0.1).collect()
    val d = out.length.toDouble
    assert(out.forall(r => math.abs(r.getAs[Double]("alpha") - 1.0 / d) < 1e-3))
    assert(out.forall(_.getAs[Double]("excess") == 0.0))
  }

  // sf0.001's %5==2 slice has no above-threshold pair, so plant an exact
  // duplicate (Jaccard 1.0) to populate the recall integral
  private def lshSample = {
    val base = docs.filter(col("doc_id") % 5 === 2)
      .select(col("doc_id"), col("text"))
    base.unionByName(base.orderBy("doc_id").limit(1)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
  }

  test("lshTune: more bands raise both recall and false-candidate load") {
    val out = Dedup.lshTune(lshSample, "doc_id", "text", n = 2,
        configs = Seq((4, 8), (4, 32), (4, 128)), threshold = 0.5)
      .orderBy("bands_b").collect()
    val rec = out.map(_.getAs[Double]("exp_recall")).toSeq
    val fp = out.map(_.getAs[Double]("exp_fp")).toSeq
    // recall is non-decreasing in b (it saturates at 1.0 when the only
    // above-threshold pairs are near-identical — still monotone)
    assert(rec == rec.sorted)
    assert(fp == fp.sorted && fp.distinct.size > 1)
    // sample's near-identical pairs exist and a wide config catches them
    assert(out.head.getAs[Long]("n_above") >= 1L)
    assert(rec.last > 0.9)
  }

  test("lshTune: more rows per band at fixed k sharpen the curve") {
    val out = Dedup.lshTune(lshSample, "doc_id", "text", n = 2,
        configs = Seq((2, 64), (16, 8)), threshold = 0.5)
      .orderBy("rows_r").collect()
    // same k=128 budget: r=16 must cut false candidates vs r=2
    assert(out.last.getAs[Double]("exp_fp") < out.head.getAs[Double]("exp_fp"))
  }
}
