package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sequential-fold expressions for the recursive-smoothing family
  * (reference behavior: pypeman nodes carry per-message running state;
  * the analytic forms are EWMA / CUSUM (Page 1954) / Holt 1957).
  *
  * Why native: s_i = α·x_i + (1−α)·s_{i−1} depends on the previous RESULT,
  * so it cannot be a window aggregate. The higher-order-function route
  * (`aggregate` with `concat(acc, array(step))`) is semantically right but
  * quadratic — every step copies the whole accumulator array, so a key
  * with n events costs O(n²) element copies and allocations; at 10⁶ events
  * per key that is 10¹² copies, a scale-killer. These expressions walk the
  * sorted series once into a pre-sized output array: O(n) time, O(n)
  * allocation, evaluated once per KEY (not per row), which is why
  * interpreted evaluation (CodegenFallback) costs nothing measurable.
  *
  * Arithmetic parity: the step expressions are the exact double ops the
  * previous `aggregate` lambdas performed, in the same association order,
  * with 1−α / 1−β pre-subtracted at construction exactly like the old
  * `lit(1.0 - alpha)` — every accumulator is bit-for-bit identical, so the
  * sequential-recursion oracles (DuckDB recursive CTEs) still match.
  *
  * Input: `array<struct<i:bigint, x:double>>` ALREADY in fold order (the
  * caller sorts; see [[graft.ops.Smoothing]]). Output mirrors the input
  * length; `i` is the row identity carried through for the explode-back.
  */
abstract class SeriesFoldExpression extends UnaryExpression with CodegenFallback {

  /** Names and per-element state fields of the output struct (after `i`). */
  protected def stateFields: Seq[String]

  override def dataType: DataType = ArrayType(
    StructType(StructField("i", LongType, nullable = false) +:
      stateFields.map(StructField(_, DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField("i", LongType, _, _), StructField("x", DoubleType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<i:bigint,x:double>>, got ${other.simpleString}")
  }

  /** Fold the series: read (i, x) pairs in order, write one output row per
    * element. `emit` receives the element index and the state values. */
  protected def fold(n: Int, read: Int => (Long, Double),
      emit: (Int, Long, Array[Double]) => Unit): Unit

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    val width = stateFields.length
    fold(
      n,
      { idx =>
        val row = arr.getStruct(idx, 2)
        (row.getLong(0), row.getDouble(1))
      },
      { (idx, i, state) =>
        val vals = new Array[Any](1 + width)
        vals(0) = i
        var f = 0
        while (f < width) { vals(f + 1) = state(f); f += 1 }
        out(idx) = InternalRow.fromSeq(vals.toIndexedSeq)
      })
    new GenericArrayData(out)
  }
}

/** EWMA: s_i = α·x_i + (1−α)·s_{i−1}, s_0 = x_0. */
case class EwmaFold(child: Expression, alpha: Double)
    extends SeriesFoldExpression {
  require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
  override def prettyName: String = "ewma_fold"
  override protected def stateFields: Seq[String] = Seq("s")
  private val oneMinusAlpha = 1.0 - alpha

  override protected def fold(n: Int, read: Int => (Long, Double),
      emit: (Int, Long, Array[Double]) => Unit): Unit = {
    var s = 0.0
    var idx = 0
    while (idx < n) {
      val (i, x) = read(idx)
      s = if (idx == 0) x else alpha * x + oneMinusAlpha * s
      emit(idx, i, Array(s))
      idx += 1
    }
  }

  override protected def withNewChildInternal(newChild: Expression): EwmaFold =
    copy(child = newChild)
}

/** Two-sided CUSUM: s⁺_i = max(0, s⁺_{i−1} + x_i − μ₀ − κ),
  * s⁻_i = max(0, s⁻_{i−1} + μ₀ − x_i − κ), both starting from 0. */
case class CusumFold(child: Expression, mu0: Double, kappa: Double)
    extends SeriesFoldExpression {
  require(kappa >= 0.0, s"kappa must be >= 0, got $kappa")
  override def prettyName: String = "cusum_fold"
  override protected def stateFields: Seq[String] = Seq("sp", "sn")

  override protected def fold(n: Int, read: Int => (Long, Double),
      emit: (Int, Long, Array[Double]) => Unit): Unit = {
    var sp = 0.0
    var sn = 0.0
    var idx = 0
    while (idx < n) {
      val (i, x) = read(idx)
      sp = math.max(0.0, sp + x - mu0 - kappa)
      sn = math.max(0.0, sn + mu0 - x - kappa)
      emit(idx, i, Array(sp, sn))
      idx += 1
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CusumFold =
    copy(child = newChild)
}

/** Holt level+trend: s_i = α·x_i + (1−α)·(s_{i−1} + b_{i−1}),
  * b_i = β·(s_i − s_{i−1}) + (1−β)·b_{i−1}; s_0 = x_0, b_0 = 0. */
case class HoltFold(child: Expression, alpha: Double, beta: Double)
    extends SeriesFoldExpression {
  require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
  require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0, 1], got $beta")
  override def prettyName: String = "holt_fold"
  override protected def stateFields: Seq[String] = Seq("s", "b")
  private val oneMinusAlpha = 1.0 - alpha
  private val oneMinusBeta = 1.0 - beta

  override protected def fold(n: Int, read: Int => (Long, Double),
      emit: (Int, Long, Array[Double]) => Unit): Unit = {
    var s = 0.0
    var b = 0.0
    var idx = 0
    while (idx < n) {
      val (i, x) = read(idx)
      if (idx == 0) { s = x; b = 0.0 }
      else {
        val sNew = alpha * x + oneMinusAlpha * (s + b)
        b = beta * (sNew - s) + oneMinusBeta * b
        s = sNew
      }
      emit(idx, i, Array(s, b))
      idx += 1
    }
  }

  override protected def withNewChildInternal(newChild: Expression): HoltFold =
    copy(child = newChild)
}

/** Holt–Winters additive triple smoothing (Winters 1960) — level + trend +
  * a length-`period` seasonal register:
  *   s_i = α·(x_i − c_{i−p}) + (1−α)·(s_{i−1} + b_{i−1})
  *   b_i = β·(s_i − s_{i−1}) + (1−β)·b_{i−1}
  *   c_i = γ·(x_i − s_i) + (1−γ)·c_{i−p}
  * with the lookahead-free init s_0 = x_0, b_0 = 0, and all seasonal slots
  * starting at 0 (so c_0 = γ·(x_0 − s_0) + (1−γ)·0 = 0 exactly — the c
  * update is uniform from the first row). The seasonal register is a
  * circular buffer indexed idx mod p, which IS the rotating queue a
  * sequential SQL recursion carries as a p-length list
  * (cs' = append(cs[2:], c_new), c_{i−p} = cs[1]) — same values, same
  * IEEE op order, so the DuckDB recursive-CTE oracle matches bit for bit.
  */
case class HoltWintersFold(
    child: Expression, alpha: Double, beta: Double, gamma: Double,
    period: Int)
    extends SeriesFoldExpression {
  require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
  require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0, 1], got $beta")
  require(gamma >= 0.0 && gamma <= 1.0, s"gamma must be in [0, 1], got $gamma")
  require(period >= 1, s"period must be >= 1, got $period")
  override def prettyName: String = "holt_winters_fold"
  override protected def stateFields: Seq[String] = Seq("s", "b", "c")
  private val oneMinusAlpha = 1.0 - alpha
  private val oneMinusBeta = 1.0 - beta
  private val oneMinusGamma = 1.0 - gamma

  override protected def fold(n: Int, read: Int => (Long, Double),
      emit: (Int, Long, Array[Double]) => Unit): Unit = {
    val cs = new Array[Double](period) // seasonal register, starts all-zero
    var s = 0.0
    var b = 0.0
    var idx = 0
    while (idx < n) {
      val (i, x) = read(idx)
      val slot = idx % period
      val cPrev = cs(slot)
      if (idx == 0) { s = x; b = 0.0 }
      else {
        val sNew = alpha * (x - cPrev) + oneMinusAlpha * (s + b)
        b = beta * (sNew - s) + oneMinusBeta * b
        s = sNew
      }
      val cNew = gamma * (x - s) + oneMinusGamma * cPrev
      cs(slot) = cNew
      emit(idx, i, Array(s, b, cNew))
      idx += 1
    }
  }

  override protected def withNewChildInternal(newChild: Expression): HoltWintersFold =
    copy(child = newChild)
}
