package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-node key/value persistence — graft's persistence backends
  * (reference: pypeman/persistence.py MemoryBackend/SqliteBackend,
  * nodes.py:283 save_data/restore_data).
  *
  * State is a parquet table (namespace, key, value, version); `store` writes
  * a new version, `get` reads the latest — snapshot semantics without a
  * database, safe for concurrent readers at scale.
  */
final class KVState(spark: SparkSession, path: String) {
  import spark.implicits._

  def store(namespace: String, key: String, value: String): Unit =
    Seq((namespace, key, value, System.nanoTime()))
      .toDF("namespace", "key", "value", "version")
      .write.mode("append").parquet(path)

  def get(namespace: String, key: String): Option[String] =
    if (!new java.io.File(path).exists()) None
    else spark.read.parquet(path)
      .filter(col("namespace") === namespace && col("key") === key)
      .orderBy(col("version").desc)
      .limit(1)
      .collect()
      .headOption
      .map(_.getAs[String]("value"))

  def asDataFrame: DataFrame = spark.read.parquet(path)
}
