package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable Bloom filter (Bloom, CACM 1970) — set-membership with no
  * false negatives and a bounded false-positive rate
  * (1 − e^{−kn/m})^k for n members, m bits, k hashes.
  *
  * Two faces of the same filter:
  *
  *  - [[bits]] — the SET-BITS RELATION: ≤ m distinct bit positions,
  *    derived with the repo's portable md5 lane-hash convention
  *    (`md5(lane ':' key)`, first 4 hex chars → position in [0, 65536)),
  *    so a SQL oracle reproduces the filter and every probe verdict
  *    exactly. Building it is one distinct over k·|S| tiny rows —
  *    partial-aggregatable (bit-set union is the Bloom merge property).
  *  - [[packedProbe]] — the SCAN-STAGE FORM for real pipelines: the same
  *    positions packed into m/64 longs ON THE DRIVER (bounded: 1024
  *    longs = 8 KiB, a driver scalar like a centroid table) and embedded
  *    as an array literal, so membership is pure codegen'd bit math
  *    (shiftright / & on the probe column) with NO join and NO shuffle —
  *    the classic "ship the filter, not the set" move that turns a
  *    distributed semi join into a map-side filter at 100 TB. Spark's own
  *    runtime bloom pushdown (InjectRuntimeFilter) does exactly this with
  *    an engine-private hash; this filter is engine-portable.
  *
  * [[BloomSpec]] pins the two faces to identical verdicts row for row,
  * and pins exact false-positive counts at a deliberately saturated m.
  */
object Bloom {

  val MBits = 65536 // 4 md5 hex chars
  val DefaultK = 3

  /** Lane-salted bit position for one key: first 4 hex chars of
    * `md5(lane ':' key)` as an integer in [0, 65536). */
  private def position(lane: Column, key: Column): Column =
    conv(substring(md5(concat(lane.cast("string"), lit(":"),
      key.cast("string"))), 1, 4), 16, 10).cast("long")

  /** The filter as its set-bits relation: distinct `pos` over the k lane
    * hashes of every member key. ≤ min(k·|S|, m) rows. */
  def bits(members: DataFrame, key: Column, k: Int = DefaultK): DataFrame = {
    require(k >= 1 && k <= 8, s"k must be in [1, 8], got $k")
    members.select(key.as("mk"))
      .select(explode(sequence(lit(0L), lit(k - 1L))).as("lane"),
        col("mk"))
      .select(position(col("lane"), col("mk")).as("pos"))
      .distinct()
  }

  /** Probe via the set-bits RELATION (the oracle-parity path): a probe is
    * a bloom hit iff all k of its positions are set. The bits side is
    * ≤ m rows and broadcasts; output = `probes` + (bloom_hit: boolean).
    * `probes` must carry a distinct key column named `keyCol`. */
  def probe(
      bitsDf: DataFrame, probes: DataFrame, keyCol: String,
      k: Int = DefaultK): DataFrame = {
    require(k >= 1 && k <= 8, s"k must be in [1, 8], got $k")
    val passThrough = probes.columns.map(col)
    probes
      .select((passThrough :+
        explode(sequence(lit(0L), lit(k - 1L))).as("lane")): _*)
      .withColumn("pos", position(col("lane"), col(keyCol)))
      .join(broadcast(bitsDf.withColumn("hit", lit(1L))), Seq("pos"), "left")
      .groupBy(passThrough: _*)
      .agg((sum(coalesce(col("hit"), lit(0L))) === k).as("bloom_hit"))
  }

  /** Probe via the PACKED literal (the scan-stage path): collects the
    * set-bits relation to m/64 longs on the driver (bounded — 8 KiB at
    * the default m) and tests membership as codegen'd bit arithmetic on
    * the probe column. Returns a boolean Column over `key`. */
  def packedProbe(bitsDf: DataFrame, key: Column, k: Int = DefaultK): Column = {
    require(k >= 1 && k <= 8, s"k must be in [1, 8], got $k")
    val words = new Array[Long](MBits / 64)
    bitsDf.select(col("pos")).collect().foreach { r =>
      val p = r.getLong(0)
      words((p >> 6).toInt) |= (1L << (p & 63))
    }
    val lut = array(words.map(lit(_)): _*)
    (0 until k).map { lane =>
      val p = position(lit(lane.toLong), key)
      (element_at(lut, (p / 64).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (p % 64).cast("int"))) =!= 0L)
    }.reduce(_ && _)
  }
}
