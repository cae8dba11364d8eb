package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle a fact table once on its join key so
  * every subsequent join/aggregation on that key is exchange-free.
  *
  * At 100 TB this is the difference between shuffling the fact table per
  * query and shuffling it once at ingest: `bucketize` writes with
  * `bucketBy(key)`, and joins between two tables bucketed on the same key
  * with the same bucket count need no Exchange (verified in spec by plan
  * inspection).
  */
object Bucketing {

  def bucketize(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // clear an orphaned location left by a previous JVM (table gone from
    // the in-memory catalog but files still on disk)
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    val w = df.write.mode(SaveMode.Overwrite).format("parquet").bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
