package graft.sim

import graft.plans.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Signed-random-projection LSH over embeddings (Charikar 2002 — SimHash
  * for real vectors): signature bit = sign of the dot product with a fixed
  * pseudo-random hyperplane; vectors agreeing on all bits of a band are
  * near-duplicate candidates, verified by exact cosine.
  *
  * The projection matrix is derived from md5 (`proj(g,i)` = first byte of
  * md5("g:i") centered to ±127.5), so the ENTIRE pipeline — signatures,
  * banding, candidate join, verify — reproduces bit-for-bit in any SQL
  * engine: unlike the xxhash64-seeded MinHash/SimHash operators (rows-only
  * checks), SRP carries a full DuckDB oracle.
  *
  * Scale shape: signatures are nBands·bitsPerBand fused codegen dot
  * products per row, computed in the scan stage (no shuffle); the band
  * join shuffles (id, band, sig) rows — nBands small rows per vector,
  * never vectors; the candidate set is a narrow distinct of bare id
  * pairs; vectors are re-joined only for the surviving candidates.
  */
object Srp {

  /** Deterministic projection component for signature bit `g`, dimension
    * `i`: first byte of md5("g:i") as unsigned int, centered to
    * [-127.5, 127.5] — portable to any engine with md5. */
  def proj(g: Int, i: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$g:$i".getBytes("UTF-8"))
    (h(0) & 0xff).toDouble - 127.5
  }

  /** Per-band signatures: one row per (id, band) with an integer bucket
    * built from `bitsPerBand` hyperplane signs. */
  def signatures(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      nBands: Int,
      bitsPerBand: Int): DataFrame = {
    require(nBands > 0 && bitsPerBand > 0 && bitsPerBand <= 62,
      s"bad band config: nBands=$nBands bitsPerBand=$bitsPerBand")
    val bandCols = (0 until nBands).map { b =>
      val sig = (0 until bitsPerBand).map { j =>
        val g = b * bitsPerBand + j
        val plane = (0 until dims).map(i => proj(g, i))
        when(VectorFunctions.vecDot(col(vecCol), typedLit(plane)) >= 0,
          lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(b.toLong).as("band"), sig.as("sig"))
    }
    df.select(col(idCol).as("id"), explode(array(bandCols: _*)).as("bs"))
      .select(col("id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Near-duplicate candidates via banded SRP, verified by exact cosine:
    * rows (id_a, id_b, cosine) with id_a < id_b and 4-decimal-floored
    * cosine >= minCosine. */
  def nearDups(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      nBands: Int,
      bitsPerBand: Int,
      minCosine: Double): DataFrame = {
    val sigs = signatures(df, idCol, vecCol, dims, nBands, bitsPerBand)
      .localCheckpoint(true)
    val cands = sigs.as("a").join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val vecs = df.select(col(idCol).as("vid"), col(vecCol).as("v"))
    val cos = VectorFunctions.vecCosine(col("va"), col("vb"))
    cands
      .join(vecs.select(col("vid").as("id_a"), col("v").as("va")), Seq("id_a"))
      .join(vecs.select(col("vid").as("id_b"), col("v").as("vb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (floor(cos * 10000 + lit(0.5)) / 10000).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }
}
