package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every query takes the scale-factor directory as a parameter so the same
  * code runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and, on
  * a real cluster, at any path. Reads are plain parquet scans so Catalyst
  * pushes filters/projections down to the source.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = normTs(t("orders"), "o_orderdate")
  def lineitem: DataFrame = normTs(t("lineitem"), "l_shipdate")

  /** Zone-independent naive→TIMESTAMP normalization for a column that a
    * foreign session (NTZ inference on) reads as TIMESTAMP_NTZ: the cast
    * interprets the naive wall clock in the session zone and
    * from_utc_timestamp adds that offset back out, landing on the
    * naive-as-UTC instant whatever the zone — identity in graft-owned
    * (UTC-pinned, inference-off) sessions. The driver writes ALL
    * date-ish columns as naive timestamp[us] (pandas default), so every
    * such column gets the same guard events.ts has. */
  private def normTs(df: DataFrame, c: String): DataFrame =
    df.schema(c).dataType match {
      case TimestampNTZType =>
        val zone = spark.conf.get("spark.sql.session.timeZone")
        df.withColumn(c, from_utc_timestamp(col(c).cast(TimestampType), zone))
      case _ => df
    }

  /** events.parquet's `ts` physical type depends on the producer, so the
    * load normalizes every flavor to a µs TIMESTAMP in the pinned-UTC
    * session:
    *  - TIMESTAMP(NANOS): Spark's reader rejects it; sessions set
    *    `spark.sql.legacy.parquet.nanosAsLong` (see GraftSession) so it
    *    arrives as nanos-since-epoch LongType and we floor-truncate to µs —
    *    the same conversion DuckDB applies, keeping oracle parity.
    *  - naive timestamp[us] (the pandas/pyarrow default,
    *    isAdjustedToUTC=false): sessions graft owns read it as TIMESTAMP
    *    directly (`inferTimestampNTZ.enabled=false`, see GraftSession); in a
    *    session graft does NOT own it arrives as TIMESTAMP_NTZ and the cast
    *    here interprets it in the session zone — identical values under UTC,
    *    matching the reference's naive datetimes (message.py:16). */
  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // see normTs — only instants inside a DST transition hour of an
        // exotic session zone can differ from the naive-as-UTC reading
        normTs(raw, "ts")
      case _ => raw
    }
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
