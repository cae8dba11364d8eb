package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes (the McCallum & Nigam 1998 event model) —
  * the classic high-throughput text classifier: train = one grouped
  * count over the (label, token) stream, predict = a token-keyed join
  * and one exact sum per (doc, class).
  *
  * Arithmetic discipline (the `q_kmeans_step` lesson): every model
  * log-probability is quantized to 1e7 FIXED-POINT LONGS at train time —
  * per-class priors, per-(class, token) likelihoods, and the unseen-token
  * smoothing default. Document scores are then INTEGER sums, so Spark's
  * nondeterministic partial-agg merge order cannot perturb a score, and
  * the argmax (min over (−score, label) structs — largest score, smallest
  * label on ties) is exactly reproducible by any engine that computes the
  * same quantized model. The only transcendental is `ln` inside the
  * model build — evaluated ONCE per model cell, not per document.
  *
  * Scale shape: the token-likelihood relation is joined on the TOKEN key,
  * never broadcast — vocabulary grows with corpus size (Heaps' law, the
  * repo's `q_perplexity` finding), while priors/defaults are
  * classes-count rows and ride a broadcast. Scoring shuffles each doc
  * token once (explode factor = |classes| on the tiny side of the join,
  * not the corpus side), and the per-(doc, class) sum is
  * partial-aggregatable. Out-of-vocabulary test tokens are dropped
  * before scoring (standard practice); a doc with NO in-vocabulary
  * tokens still gets a prediction (= argmax prior) via the final
  * right join onto the doc × class frame.
  */
object NaiveBayes {

  private val Scale = 1e7

  /** Quantized log as a fixed-point long column. */
  private def lnFp(x: Column): Column =
    round(log(x) * Scale).cast("long")

  /** Model relations, all carrying fixed-point longs:
    *  - `prior`: (label, prior_fp, default_fp) — |classes| rows;
    *  - `likelihood`: (label, tok, ll_fp) — |classes|·|vocab| rows max;
    *  - `vocab`: (tok) — the train vocabulary (OOV filter for predict). */
  final case class Model(prior: DataFrame, likelihood: DataFrame, vocab: DataFrame)

  /** Train from a tokenized stream `(labelCol, tokCol)` — one row per
    * token occurrence — and the per-doc label relation `(labelCol)` —
    * one row per training document (for the priors). Laplace add-1. */
  def train(
      docLabels: DataFrame, tokens: DataFrame,
      labelCol: String, tokCol: String): Model = {
    val lab = col(labelCol)
    val nDocs = docLabels.select(count(lit(1)).as("n_total"))
    val cls = docLabels.groupBy(lab).agg(count(lit(1)).as("n_docs"))
    val vocab = tokens.select(col(tokCol).as("tok")).distinct()
    val vSize = vocab.select(count(lit(1)).as("v"))
    val ctot = tokens.groupBy(lab).agg(count(lit(1)).as("total"))
    val prior = cls
      .join(ctot, labelCol)
      .crossJoin(broadcast(nDocs))
      .crossJoin(broadcast(vSize))
      .select(lab,
        lnFp(col("n_docs").cast("double") / col("n_total")).as("prior_fp"),
        lnFp(lit(1.0) / (col("total") + col("v"))).as("default_fp"),
        (col("total") + col("v")).as("denom"))
    val likelihood = tokens
      .groupBy(lab, col(tokCol).as("tok"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(prior.select(lab, col("denom"))), labelCol)
      .select(lab, col("tok"),
        lnFp((col("cnt") + 1).cast("double") / col("denom")).as("ll_fp"))
    Model(prior.drop("denom"), likelihood, vocab)
  }

  /** Classify: `tokens` is the tokenized test stream `(idCol, tokCol)`,
    * `docIds` the distinct test-doc relation `(idCol)` (so all-OOV docs
    * still surface). Output: (idCol, pred: label, score_fp: long). */
  def predict(
      model: Model, docIds: DataFrame, tokens: DataFrame,
      idCol: String, tokCol: String): DataFrame = {
    val labelCol = model.prior.columns.head
    val dtok = tokens
      .select(col(idCol), col(tokCol).as("tok"))
      .join(model.vocab, Seq("tok"), "left_semi")
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val sums = dtok
      .crossJoin(broadcast(model.prior.select(col(labelCol), col("default_fp"))))
      .join(model.likelihood, Seq(labelCol, "tok"), "left")
      .groupBy(col(idCol), col(labelCol))
      .agg(sum(col("tf") * coalesce(col("ll_fp"), col("default_fp"))).as("s"))
    docIds
      .crossJoin(broadcast(model.prior.select(col(labelCol), col("prior_fp"))))
      .join(sums, Seq(idCol, labelCol), "left")
      .select(col(idCol), col(labelCol),
        (col("prior_fp") + coalesce(col("s"), lit(0L))).as("score_fp"))
      .groupBy(col(idCol))
      .agg(
        min(struct((-col("score_fp")).as("ns"), col(labelCol).as("lab")))
          .as("best"))
      .select(col(idCol), col("best.lab").as("pred"),
        (-col("best.ns")).as("score_fp"))
  }
}
