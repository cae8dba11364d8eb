package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for fact-fact joins at scale.
  *
  * AQE's skew-join split handles most cases; explicit salting remains the
  * tool of choice when one side has a handful of pathological hot keys and
  * the other side is small enough to replicate per salt (e.g. joining a
  * 100 TB event log against per-key dimension state where one tenant is
  * 40% of traffic).
  */
object SkewOps {

  /** Salted equi-join: the skewed (big) side gets a random salt in
    * [0, salts); the compact side is exploded `salts`× so every
    * (key, salt) bucket finds its match. Equivalent rows to a plain inner
    * join, but the hot key's rows spread over `salts` reducers.
    */
  def saltedJoin(
      skewed: DataFrame,
      compact: DataFrame,
      key: String,
      salts: Int): DataFrame = {
    val s = skewed.withColumn("__salt", (rand(42) * salts).cast("int"))
    val c = compact.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1), lit(1))))
    s.join(c, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Key-frequency report to decide whether salting is warranted: top-n
    * keys with their share of rows. */
  def skewReport(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") / total, 4))
      .orderBy(col("n").desc)
      .limit(topN)
  }
}
