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

  /** ADAPTIVE salted join: salt ONLY detected hot keys. [[saltedJoin]]
    * replicates the compact side `salts`× for EVERY key — at a 10⁹-key
    * dimension that multiplies the whole build side to spread a handful
    * of hot keys. This variant first finds keys with ≥ `hotMinCount`
    * rows on the skewed side (one partial-agg pass — map-side combine
    * means the exchange carries distinct keys, not rows; substitute a
    * sampled count at extreme key cardinality), broadcasts that tiny
    * hot set, and salts/explodes ONLY those keys: the long tail joins
    * exactly as before, the hot keys spread over `salts` reducers, and
    * the compact side grows by |hot|·(salts−1) rows instead of
    * |compact|·(salts−1).
    *
    * The salt is md5-derived from `saltSource` (a row-identity column
    * on the skewed side), NOT rand(): task retries and engine replays
    * reproduce identical placement, so results are deterministic and
    * oracle-checkable. Row-equivalent to the plain inner join. */
  def adaptiveSaltedJoin(
      skewed: DataFrame,
      compact: DataFrame,
      key: String,
      saltSource: Column,
      salts: Int,
      hotMinCount: Long): DataFrame = {
    require(salts >= 2, s"salts must be >= 2, got $salts")
    val hot = skewed.groupBy(col(key))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= hotMinCount)
      .select(col(key), lit(1).as("__hot"))
    // coalesce: md5(NULL) is NULL, and a null __salt would silently drop
    // the row from the inner join below — a NULL saltSource lands in
    // bucket 0 instead, preserving row-equivalence with the plain join.
    val saltOf = coalesce(
      pmod(
        conv(substring(md5(saltSource.cast("string")), 1, 15), 16, 10)
          .cast("long"),
        lit(salts.toLong)),
      lit(0L))
    val s = skewed.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt",
        when(col("__hot").isNotNull, saltOf).otherwise(lit(0L)))
      .drop("__hot")
    val c = compact.join(broadcast(hot), Seq(key), "left")
      .withColumn("__salt", explode(
        when(col("__hot").isNotNull,
          sequence(lit(0L), lit((salts - 1).toLong)))
          .otherwise(array(lit(0L)))))
      .drop("__hot")
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
