package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for the write path: multi-dimensional
  * clustering so downstream scans skip files on EITHER predicate column.
  *
  * A range-partitioned sort on (a, b) clusters perfectly on `a` but
  * scatters `b`; Z-ordering interleaves the bits of both columns'
  * normalized ranks so file-level min/max statistics stay tight on every
  * participating dimension — the standard trick behind data-skipping
  * layouts at 100 TB. The interleave is pure integer column math
  * (shift/and/or terms, unrolled at plan-build time, whole-stage
  * codegen'd — and engine-portable, so a DuckDB oracle can replicate it
  * bit for bit).
  */
object Layout {

  /** Interleave the low `bits` of two bucketized dimensions into a
    * Z-value: bit b of x lands at 2b, bit b of y at 2b+1. */
  def zInterleave(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { b =>
      (shiftleft(shiftright(x, b).bitwiseAND(1), 2 * b))
        .bitwiseOR(shiftleft(shiftright(y, b).bitwiseAND(1), 2 * b + 1))
    }.reduce(_.bitwiseOR(_)).cast("long")

  /** Normalize a numeric column to an integer bucket in [0, 2^bits).
    * The scaling runs in DOUBLE: long math would overflow (v−lo)·2¹⁶ for
    * ranges ≥ 2⁴⁷ — e.g. a unix-micros column spanning years — which
    * under ANSI mode throws and otherwise wraps into garbage buckets.
    * Doubles are exact here up to 2⁵³, far past any bucket boundary's
    * needed precision. */
  def zBucket(v: Column, lo: Column, hi: Column, bits: Int): Column = {
    val buckets = 1L << bits
    val vd = v.cast("double"); val lod = lo.cast("double"); val hid = hi.cast("double")
    least(lit(buckets - 1),
      floor((vd - lod) * buckets / (hid - lod + lit(1e-12))).cast("long"))
  }

  /** Z-value for two numeric columns with bounds from a single 1-row
    * aggregate broadcast back (same tiny-parameter shape as the
    * histogram/temperature-mix operators). */
  def withZValue(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 16, outCol: String = "z"): DataFrame = {
    val bounds = df.agg(
      min(col(xCol)).as("__xlo"), max(col(xCol)).as("__xhi"),
      min(col(yCol)).as("__ylo"), max(col(yCol)).as("__yhi"))
    df.crossJoin(broadcast(bounds))
      .withColumn(outCol, zInterleave(
        zBucket(col(xCol), col("__xlo"), col("__xhi"), bits),
        zBucket(col(yCol), col("__ylo"), col("__yhi"), bits), bits))
      .drop("__xlo", "__xhi", "__ylo", "__yhi")
  }

  /** Cluster for writing: range-partition on the Z-value and sort within
    * partitions — each output file covers a compact Z-range, so its
    * min/max stats are tight on BOTH dimensions. */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int, bits: Int = 16): DataFrame = {
    val z = withZValue(df, xCol, yCol, bits)
    z.repartitionByRange(numFiles, col("z")).sortWithinPartitions(col("z"))
  }
}
