package graft

import org.apache.spark.sql.SparkSession

/** One-query scale probe: time a registry query at an arbitrary SF dir
  * under an arbitrary shuffle-partition count — the instrument for
  * separating "plan is superlinear" from "32 post-shuffle partitions
  * spill at this volume" when a decade slope flags
  * ([[ScaleDecade]] companion; round-15 q_pagerank investigation).
  *
  * Usage: runMain graft.ScaleProbe <query> <sfDir> <shufflePartitions> [reps]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, parts) = args.take(3)
    val reps = if (args.length > 3) args(3).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts))
      .getOrCreate()
    GraftSession.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[probe] $name parts=$parts rep=$r rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
