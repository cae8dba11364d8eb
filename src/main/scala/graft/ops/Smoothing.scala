package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Recursive smoothing — the classic awkward-relational operator family:
  * s_i = α·x_i + (1−α)·s_{i−1} with s_0 = x_0 cannot be a plain window
  * aggregate (every row depends on the previous RESULT, not the previous
  * input). graft computes it as an exact per-key left fold: gather one
  * key's series (sorted), fold it in one O(n) pass inside a native
  * Catalyst expression ([[graft.plans.SeriesFoldExpression]]), explode the
  * result back to rows. (The earlier higher-order `aggregate` +
  * `concat(acc, …)` formulation was the same fold but quadratic — each
  * step copied the whole accumulator array; see FoldExpressions' scaladoc.)
  *
  * Why this shape at 100 TB: one shuffle (the groupBy key — same exchange
  * any per-key op pays), then the fold is embarrassingly parallel across
  * keys with NO window sort-spill and no O(n) self-joins. Memory holds one
  * key's series at a time, which is the right trade when series are
  * bounded (events per user, metrics per host — Heaps'-law-ish corpora);
  * an unbounded per-key stream belongs to the streaming form
  * (mapGroupsWithState) instead. The log-domain closed form
  * (s_i = (1−α)^i·[x_0 + Σ α·x_j·(1−α)^{−j}]) would window-scan without
  * the gather but overflows (1−α)^{−j} past j ≈ 4000 — rejected for being
  * silently wrong on exactly the long series where it would matter.
  *
  * The fold order (ord, id) and the arithmetic (α·x + (1−α)·s, one fma-free
  * expression) are deterministic and engine-portable: a sequential SQL
  * recursion (DuckDB recursive CTE) reproduces the values bit-for-bit.
  */
object Smoothing {

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Per-key series as `array<struct<i,x>>` in (ord, id) fold order —
    * sort_array orders the carrier struct lexicographically by (o, i, x),
    * the projection then drops the ordering field. */
  private def sortedSeries(
      ordCol: String, idCol: String, valCol: String): Column =
    transform(
      sort_array(collect_list(struct(
        col(ordCol).as("o"), col(idCol).cast("long").as("i"),
        col(valCol).cast("double").as("x")))),
      e => struct(e.getField("i").as("i"), e.getField("x").as("x")))

  /** EWMA per key. `idCol` must be castable to long and unique within a
    * key (the emitted row identity); ties on `ordCol` break by id. Output:
    * (key, id, ewma) with ewma UNROUNDED — callers round for display. */
  def ewma(
      df: DataFrame, keyCol: String, ordCol: String,
      idCol: String, valCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val folded = ColumnBridge.column(graft.plans.EwmaFold(
      ColumnBridge.expression(col("series")), alpha))
    df.groupBy(col(keyCol))
      .agg(sortedSeries(ordCol, idCol, valCol).as("series"))
      .select(col(keyCol), explode(folded).as("e"))
      .select(col(keyCol), col("e.i").as(idCol), col("e.s").as("ewma"))
  }

  /** Two-sided CUSUM control chart (Page, Biometrika 1954) — per-key
    * change detection against a KNOWN target level μ₀ with slack κ and
    * decision interval h:
    *   s⁺_i = max(0, s⁺_{i−1} + x_i − μ₀ − κ)   (upward shifts)
    *   s⁻_i = max(0, s⁻_{i−1} + μ₀ − x_i − κ)   (downward shifts)
    * alarm when either exceeds h. Same recursion class as [[ewma]]
    * (each row depends on the previous RESULT), so the same exact
    * per-key sorted fold inside one native O(n) expression — one shuffle
    * on the key, no window self-dependence; μ₀/κ/h are a-priori design
    * constants (the control-chart contract), NOT data-derived, so no
    * float aggregation exists anywhere and a sequential SQL recursion
    * reproduces every accumulator bit for bit.
    *
    * Output: (key, id, s_pos, s_neg, alarm) — accumulators UNROUNDED. */
  def cusum(
      df: DataFrame, keyCol: String, ordCol: String, idCol: String,
      valCol: String, mu0: Double, kappa: Double, h: Double): DataFrame = {
    require(kappa >= 0.0, s"kappa must be >= 0, got $kappa")
    require(h > 0.0, s"h must be > 0, got $h")
    val folded = ColumnBridge.column(graft.plans.CusumFold(
      ColumnBridge.expression(col("series")), mu0, kappa))
    df.groupBy(col(keyCol))
      .agg(sortedSeries(ordCol, idCol, valCol).as("series"))
      .select(col(keyCol), explode(folded).as("e"))
      .select(col(keyCol), col("e.i").as(idCol),
        col("e.sp").as("s_pos"), col("e.sn").as("s_neg"),
        (col("e.sp") > h || col("e.sn") > h).as("alarm"))
  }

  /** Holt double exponential smoothing (Holt 1957) — per-key level +
    * trend recursion:
    *   s_i = α·x_i + (1−α)·(s_{i−1} + b_{i−1})
    *   b_i = β·(s_i − s_{i−1}) + (1−β)·b_{i−1}
    * with s_0 = x_0, b_0 = 0 (the lookahead-free init — x_1 − x_0 would
    * need the NEXT element inside the fold). Same recursion class as
    * [[ewma]]/[[cusum]]: exact per-key sorted fold inside one native O(n)
    * expression, one key shuffle, no window self-dependence. The b_i
    * update reads the s_i VALUE (same IEEE ops as an oracle that
    * textually duplicates the s expression), and 1−α / 1−β are computed
    * in double arithmetic at construction so a sequential SQL recursion
    * with the same literal subtraction reproduces every bit.
    *
    * Output: (key, id, s_level, s_trend) — UNROUNDED; `s_level + s_trend`
    * is the one-step-ahead forecast, left to callers so the gate pins the
    * two accumulators independently. */
  def holt(
      df: DataFrame, keyCol: String, ordCol: String, idCol: String,
      valCol: String, alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0, 1], got $beta")
    val folded = ColumnBridge.column(graft.plans.HoltFold(
      ColumnBridge.expression(col("series")), alpha, beta))
    df.groupBy(col(keyCol))
      .agg(sortedSeries(ordCol, idCol, valCol).as("series"))
      .select(col(keyCol), explode(folded).as("e"))
      .select(col(keyCol), col("e.i").as(idCol),
        col("e.s").as("s_level"), col("e.b").as("s_trend"))
  }

  /** Holt–Winters additive triple smoothing (Winters, Mgmt Sci 1960) —
    * level + trend + a length-`period` seasonal register; see
    * [[graft.plans.HoltWintersFold]] for the recursion, init, and the
    * rotating-queue equivalence a sequential SQL recursion reproduces.
    * Same scale shape as [[holt]]: one key shuffle, O(n) per key, O(p)
    * extra state. Output: (key, id, s_level, s_trend, s_season)
    * UNROUNDED. */
  def holtWinters(
      df: DataFrame, keyCol: String, ordCol: String, idCol: String,
      valCol: String, alpha: Double, beta: Double, gamma: Double,
      period: Int): DataFrame = {
    val folded = ColumnBridge.column(graft.plans.HoltWintersFold(
      ColumnBridge.expression(col("series")), alpha, beta, gamma, period))
    df.groupBy(col(keyCol))
      .agg(sortedSeries(ordCol, idCol, valCol).as("series"))
      .select(col(keyCol), explode(folded).as("e"))
      .select(col(keyCol), col("e.i").as(idCol),
        col("e.s").as("s_level"), col("e.b").as("s_trend"),
        col("e.c").as("s_season"))
  }

  /** Classical additive seasonal decomposition (the moving-average method
    * behind STL's ancestor, Macaulay 1931): x = trend + seasonal + residual.
    *   trend_i    = centered moving average over ±h rows (FULL frames only
    *                — edge rows get NULL, never a shrunken biased mean)
    *   seasonal_p = mean of detrended values at phase p = (rank−1) mod
    *                `period` within the key
    *   residual   = detrended − seasonal.
    * Fully relational — two windows over ONE (key, ord, id) sort plus a
    * phase-partitioned mean: no fold needed because nothing recurses on
    * its own output. Scale: one key exchange for the ordered windows, one
    * (key, phase) exchange for the seasonal mean; both uniform-keyed.
    *
    * Numeric contract (the q_naive_bayes fixed-point precedent): values
    * are milli-quantized at entry (floor(x·1000 + ½) as BIGINT) and every
    * aggregate is an EXACT integer sum — float enters only in the final
    * display divisions, which are the same two IEEE ops on both engines.
    * A raw-double formulation would hang the seasonal mean on the
    * engines' float-summation ORDER (Spark partial-agg vs DuckDB segment
    * tree), which was observed to straddle the 4-decimal floor at sf0.1.
    * Sub-milli signal is below the decomposition's noise floor.
    *
    * Output: (key, id, phase, trend, seasonal, resid) for rows with a
    * full trend frame, UNROUNDED doubles from the exact numerators. */
  def seasonalDecompose(
      df: DataFrame, keyCol: String, ordCol: String, idCol: String,
      valCol: String, period: Int, halfWindow: Int): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    require(halfWindow >= 1, s"halfWindow must be >= 1, got $halfWindow")
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col(ordCol), col(idCol))
    val frame = wOrd.rowsBetween(-halfWindow, halfWindow)
    val wPhase = Window.partitionBy(col(keyCol), col("phase"))
    val full = 2 * halfWindow + 1
    // units: xq in milli; tnum in milli·full; dnum/snum in milli·full
    val scale = 1000.0 * full
    df.select(col(keyCol), col(ordCol), col(idCol),
        floor(col(valCol).cast("double") * 1000 + lit(0.5)).cast("long").as("xq"))
      .withColumn("phase", (row_number().over(wOrd) - 1) % period)
      .withColumn("tnum",
        when(count(lit(1)).over(frame) === full, sum(col("xq")).over(frame)))
      .withColumn("dnum", col("xq") * full - col("tnum"))
      .withColumn("snum", sum(col("dnum")).over(wPhase))
      .withColumn("scnt", count(col("dnum")).over(wPhase))
      .filter(col("tnum").isNotNull)
      .select(col(keyCol), col(idCol), col("phase"),
        (col("tnum").cast("double") / scale).as("trend"),
        (col("snum").cast("double") / (col("scnt").cast("double") * scale))
          .as("seasonal"),
        (col("dnum").cast("double") / scale
          - col("snum").cast("double") / (col("scnt").cast("double") * scale))
          .as("resid"))
  }

  final case class Point(key: Long, ts: Long, id: Long, x: Double)
  final case class EwmaState(lastTs: Long, lastId: Long, s: Double)
  final case class Smoothed(key: Long, id: Long, ewma: Double)

  /** Streaming EWMA — the unbounded-series form [[ewma]]'s scaladoc defers
    * to: the running smoothed value is per-key `GroupState` carried across
    * micro-batches (`flatMapGroupsWithState`), so a key's series never
    * materializes anywhere. Events inside one invocation fold in (ts, id)
    * order; an event at or before the state's high-water mark is DROPPED
    * (the recursion is already past it — replaying it would double-count;
    * same discard semantics watermarked aggregations apply to late rows).
    * On a batch Dataset each key sees all its events in one invocation, so
    * the result equals the relational [[ewma]] exactly (spec-pinned). */
  def ewmaStream(points: Dataset[Point], alpha: Double): Dataset[Smoothed] = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    implicit val stateEnc = Encoders.product[EwmaState]
    implicit val outEnc = Encoders.product[Smoothed]
    points
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[EwmaState, Smoothed](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        case (key, evs, state: GroupState[EwmaState]) =>
          var st = state.getOption
          val sorted = evs.toSeq.sortBy(e => (e.ts, e.id))
            .filter(e => st.forall(p =>
              e.ts > p.lastTs || (e.ts == p.lastTs && e.id > p.lastId)))
          val out = sorted.map { e =>
            val s = st match {
              case Some(p) => alpha * e.x + (1.0 - alpha) * p.s
              case None => e.x // s_0 = x_0
            }
            st = Some(EwmaState(e.ts, e.id, s))
            Smoothed(key, e.id, s)
          }
          st.foreach(state.update)
          out.iterator
      }
  }
}
