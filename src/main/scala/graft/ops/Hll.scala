package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable HyperLogLog distinct-count estimation (Flajolet, Fusy,
  * Gandouet, Meunier — AofA 2007).
  *
  * Spark's own `approx_count_distinct` is HLL++ with an engine-private
  * hash, so its estimates can't be verified by any other engine (the
  * repo's `q_sketch` is rows-only for exactly that reason). This
  * implementation derives the sketch from md5 — the same portable
  * content-hash convention as [[Sampling.hashBucket]] — so ANY SQL engine
  * reproduces the registers and the estimate digit for digit, and the
  * correctness gate can hash-compare an approximate algorithm.
  *
  * Scale shape: registers are `groupBy(groups :+ bucket).agg(max(rho))` —
  * a partial-aggregatable two-level aggregate over at most m rows per
  * group after the map side, which IS the mergeable-sketch property (a
  * partition's partial register table merges by max, exactly how HLL
  * unions work). The estimate folds registers with exact integer
  * arithmetic: Σ 2^(−M_j) is summed as Σ 2^(49−M_j) in BIGINT (every term
  * exact, order-free) and divided once in double at the end — no float
  * summation order anywhere.
  *
  * p is fixed at 8 (m = 256 registers): the bucket is the first two md5
  * hex chars and the rho field the next twelve (48 bits), keeping every
  * derivation hex-digit-aligned for cross-engine SQL. Standard error
  * 1.04/√256 ≈ 6.5%. The small-range linear-counting correction
  * (E ≤ 2.5m with empty registers → m·ln(m/V)) uses ln, whose last-ulp
  * cross-engine parity is not guaranteed — callers who need the gate to
  * hash-match should stay in the raw regime (n ≳ 3m); the correction is
  * still applied for real use below 2.5m.
  */
object Hll {

  private[graft] val M = 256 // p = 8
  /** 2⁴⁹ — the exact-integer scale for Σ 2^(−M_j): rho ≤ 49, so every
    * scaled term 2^(49−M_j) ≥ 1 is an exact BIGINT. */
  private[graft] val Scale = 562949953421312L

  /** (bucket, rho) for one key: bucket = first 2 md5 hex chars, rho =
    * 1 + leading zeros of the next 48 hash bits (49 when all zero).
    * Package-visible so register-BASED algorithms (HyperBall,
    * [[graft.graph.Graph.harmonicCentralityHyperBall]]) derive the
    * identical portable registers. */
  private[graft] def bucketAndRho(key: Column): (Column, Column) = {
    val h = md5(key.cast("string"))
    val bucket = conv(substring(h, 1, 2), 16, 10).cast("long")
    val w = conv(substring(h, 3, 12), 16, 10).cast("long")
    // Spark bin() strips leading zeros (bin(0) = "0", hence the guard);
    // oracle parity: 49 - length(ltrim(bin(w), '0')) covers both cases
    val rho = when(w === 0, lit(49))
      .otherwise(lit(49) - length(bin(w))).cast("long")
    (bucket, rho)
  }

  /** α_m · m² for m = 256, spelled as the standard constant formula so an
    * oracle writing the same literals lands on the identical double. */
  private def alphaM2: Column =
    lit(0.7213) / (lit(1.0) + lit(1.079) / M) * (M * M)

  /** HLL distinct estimate of `key` per `groups` (global when empty).
    * Returns groups ++ (estimate: double). The estimate is raw HLL in the
    * large range; below 2.5m with empty registers present it switches to
    * linear counting (m·ln(m/V)) — see the class doc for the parity
    * caveat on that branch. */
  def hllDistinct(
      df: DataFrame, key: Column, groups: Seq[Column]): DataFrame = {
    val (bucket, rho) = bucketAndRho(key)
    val regs = df
      .groupBy((groups :+ bucket.as("bucket")): _*)
      .agg(max(rho).as("m_j"))
    val gcols = regs.columns.dropRight(2).map(col)
    estimateFromRegisters(regs, gcols.toSeq)
  }

  /** Seed a PACKED register array (256 `int` slots) holding exactly one
    * key — slot `bucket(key)` = `rho(key)`, all others 0 (0 = empty;
    * real rho is always ≥ 1). The packed shape for algorithms that
    * maintain a sketch per row across rounds ([[graft.plans
    * .RegisterMax]] is its merge aggregate, [[estimateFromPacked]] its
    * estimate fold). */
  private[graft] def packedRegister(key: Column): Column = {
    val (bucket, rho) = bucketAndRho(key)
    transform(sequence(lit(0), lit(M - 1)),
      i => when(i === bucket.cast("int"), rho.cast("int")).otherwise(lit(0)))
  }

  /** Estimate from ONE packed register array — digit-identical to the
    * row-shaped fold in [[estimateFromRegisters]]: an empty slot
    * (m_j = 0) contributes 2^(49−0) = the same `Scale` term the row form
    * adds per absent register, so one exact-integer fold over all 256
    * slots covers present and empty uniformly. */
  private[graft] def estimateFromPacked(r: Column): Column = {
    val s = aggregate(r, lit(0L),
      (acc, x) => acc + call_function("shiftleft", lit(1L),
        (lit(49) - x).cast("int")))
    val zeros = size(filter(r, x => x === 0))
    val raw = alphaM2 * Scale / s
    when(raw <= 2.5 * M && zeros > 0,
      lit(M.toDouble) * log(lit(M.toDouble) / zeros))
      .otherwise(raw)
  }

  /** Fold an `(…groups, bucket, m_j)` register table to per-group
    * estimates `(…groups, estimate)` — the shared tail of
    * [[hllDistinct]], package-visible so algorithms that MAINTAIN
    * registers across rounds (HyperBall) reuse the identical
    * exact-integer fold and branch predicate. */
  private[graft] def estimateFromRegisters(
      regs: DataFrame, gcols: Seq[Column]): DataFrame =
    regs
      .groupBy(gcols: _*)
      .agg(
        sum(expr(s"shiftleft(1L, cast(49 - m_j as int))")).as("s_present"),
        count(lit(1)).as("nregs"))
      .select((gcols :+ {
        val s = col("s_present") + (lit(M.toLong) - col("nregs")) * Scale
        val raw = alphaM2 * Scale / s
        val zeros = lit(M.toLong) - col("nregs")
        when(raw <= 2.5 * M && zeros > 0,
          lit(M.toDouble) * log(lit(M.toDouble) / zeros))
          .otherwise(raw).as("estimate")
      }): _*)
}
