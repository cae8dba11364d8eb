package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition for `q_winnow_pairs_scaled` (round 17) — times the
  * four stages of [[graft.ops.Winnow.nearDuplicates]] at auto cap the way
  * the query actually executes them (one pinned fingerprint relation
  * feeding cap derivation, df filter, and the pair join), so a flagged
  * decade slope can be attributed to a STAGE instead of guessed at:
  *
  *  - `fp`: fingerprint pipeline → localCheckpoint materialization (the
  *    O(corpus text) md5+window-min scan, run once, pinned)
  *  - `cap`: [[graft.ops.Winnow.autoDocFreqCap]] on the pinned relation
  *    (count + countDistinct — one pass over pinned rows)
  *  - `df`: doc-frequency groupBy + cap filter + semi-style join back
  *    (fp-keyed shuffle of pinned rows)
  *  - `pairs`: the capped self-join + shared-count agg + minShared filter
  *    (the stage whose output the cap bounds to Σ C(df≤cap, 2))
  *
  * Census columns (total/distinct fps, cap, post-cap buckets and pair
  * budget, max df) print alongside so "unit of work grew" and "wall
  * grew" separate. Usage:
  * `runMain graft.WinnowProbe <sfDir> [reps]` (env: SPARK_GRAFT_CPUS).
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    GraftSession.install(spark)
    spark.sparkContext.setLogLevel("WARN")

    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    (1 to reps).foreach { rep =>
      val docs = Tables(spark, sfDir).documents
      val fps0 = graft.ops.Winnow.fingerprints(docs, "doc_id", "text",
        k = 8, w = 16)
      val pinned = fps0.localCheckpoint(false)
      val tFp = sec(pinned.count())
      var cap = 0L
      val tCap = sec { cap = graft.ops.Winnow.autoDocFreqCap(pinned) }
      val kept = pinned.groupBy(col("fp"))
        .agg(count(lit(1)).as("__df")).filter(col("__df") <= cap)
        .select(col("fp"))
      val filtered = pinned.join(kept, "fp")
      val tDf = sec(filtered.count())
      val a = filtered.select(col("doc_id").as("a"), col("fp"))
      val b = filtered.select(col("doc_id").as("b"), col("fp"))
      val pairs = a.join(b, "fp").filter(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 3L)
      val tPairs = sec(pairs.count())

      val census = pinned.groupBy(col("fp")).agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("distinct_fp"), sum(col("n")).as("total"),
          max(col("n")).as("max_df"),
          sum(when(col("n") <= cap, col("n") * (col("n") - 1) / 2)
            .otherwise(lit(0))).cast("long").as("capped_pair_budget"),
          sum(when(col("n") <= cap, lit(1)).otherwise(lit(0)))
            .as("kept_buckets")).head()
      println(f"[winnow-probe] $sfDir rep=$rep cap=$cap " +
        f"fp=$tFp%.2f cap_s=$tCap%.2f df=$tDf%.2f pairs=$tPairs%.2f " +
        f"total=${census.getLong(1)} distinct=${census.getLong(0)} " +
        f"max_df=${census.getLong(2)} budget=${census.getLong(3)} " +
        f"kept=${census.getLong(4)}")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
