package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-vector symmetric int8 scalar quantization for embedding columns —
  * the standard 4× memory/IO compression for large ANN corpora (each
  * float32 dim becomes one byte plus a shared per-vector scale).
  *
  * scale = max|x| / 127;  q[i] = round(x[i] / scale)  ∈ [-127, 127]
  *
  * Composed entirely from built-in codegen'd array functions (transform /
  * aggregate / zip_with) — scan-stage work, no shuffle, no UDF. Integer
  * dot products are exact and engine-portable, so quantized pipelines
  * remain oracle-checkable; cosine over int8 codes needs no scales at all
  * (they cancel). At 100 TB the win is physical: a materialized `q` column
  * reads 4× less off parquet and packs 4× more vectors per executor-GB in
  * the similarity-join build side.
  */
object Quantize {

  /** Per-vector symmetric scale (ε-floored so zero vectors stay finite). */
  def int8Scale(vec: Column): Column =
    greatest(array_max(transform(vec, x => abs(x.cast("double")))), lit(1e-30)) / 127.0

  /** Adds `scaleCol` (double) and `qCol` (array<tinyint>) for `vecCol`.
    * round() is half-away-from-zero in both Spark and DuckDB, and
    * |x|/scale ≤ 127 by construction, so no clamp is needed. */
  def quantizeInt8(
      df: DataFrame,
      vecCol: String,
      qCol: String = "q",
      scaleCol: String = "q_scale"): DataFrame =
    df.withColumn(scaleCol, int8Scale(col(vecCol)))
      .withColumn(qCol,
        transform(col(vecCol), x => round(x.cast("double") / col(scaleCol)).cast("tinyint")))

  /** Exact integer dot product of two int8 code arrays (long — no overflow
    * below ~2³⁰ dims at worst-case |q|=127). */
  def int8Dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, v) => acc + v)

  /** Approximate float dot reconstructed from codes: (qa·qb)·sa·sb. */
  def dequantDot(qa: Column, sa: Column, qb: Column, sb: Column): Column =
    int8Dot(qa, qb).cast("double") * sa * sb

  /** Cosine over int8 codes — the per-vector scales cancel, so this needs
    * only the code arrays. Error vs float cosine is O(1/127) per dim. */
  def int8Cosine(qa: Column, qb: Column): Column =
    int8Dot(qa, qb).cast("double") /
      (sqrt(int8Dot(qa, qa).cast("double")) * sqrt(int8Dot(qb, qb).cast("double")))

  /** Sign-bit codes packed into ⌈dims/64⌉ longs — the production format
    * behind [[graft.sim.Ann.hammingRecall]]'s 1-bit evaluation (32×
    * memory/IO vs float32; a 64-dim embedding becomes ONE long). Bit
    * i%64 of word i/64 is set iff vec[i] > 0, OR-folded via the SQL
    * shiftleft (bit ops never overflow — an `acc·2+bit` fold would trip
    * ANSI long-overflow on the sign bit). Scan-stage HOF composition
    * (sequence/aggregate), no shuffle, no UDF. */
  def packSignBits(vec: Column, dims: Int): Column = {
    require(dims > 0, "dims must be positive")
    val nWords = (dims + 63) / 64
    transform(sequence(lit(0), lit(nWords - 1)), w =>
      aggregate(
        sequence(w * 64, least(w * 64 + lit(63), lit(dims - 1))),
        lit(0L),
        (acc, i) => acc.bitwiseOR(
          when(element_at(vec, i + 1) > 0f,
            call_function("shiftleft", lit(1L), (i % 64).cast("int")))
            .otherwise(lit(0L)))))
  }

  /** Hamming distance between two packed sign-bit code arrays:
    * Σ popcount(a XOR b) — the per-pair cost drops from D boolean ops to
    * D/64 xor+popcount words, which is what makes brute-force 1-bit
    * rescoring feasible over billions of codes. Exact by construction:
    * a spec pins equality with the unpacked sign-mismatch count, so the
    * storage format cannot change any measured recall. */
  def hammingPacked(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, v) => acc + v)
}
