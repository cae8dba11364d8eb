package graft

import org.apache.spark.sql.SparkSession

/** Session factory with graft's required configuration. */
object GraftSession {

  /** Settings every graft session needs; callable on any builder so the
    * driver-owned mains (Verify/Bench) and tests share one definition. */
  def configure(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet carries TIMESTAMP(NANOS); read as long (see Tables)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // pandas/pyarrow write naive (isAdjustedToUTC=false) timestamps by
      // default, which Spark 4 infers as TIMESTAMP_NTZ — a type rejected by
      // watermarks and unix_micros/unix_millis. Read them as plain TIMESTAMP
      // in the pinned-UTC session instead: naive-µs-under-UTC is exactly the
      // reference's naive local datetime semantics (message.py:16).
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // single-file test tables are ~25 MB — below the 128 MB default split
      // size, which would serialize every scan onto one core. 8 MB splits
      // restore scan parallelism locally; on a real cluster with many files
      // per table the default is appropriate (see SURVEY §5).
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")

  /** Post-build session setup: installs graft's optimizer rules (inert
    * until their confs are set — see `plans.RangeJoinRule`). Idempotent;
    * needed because `withExtensions` cannot apply to an already-built
    * session and the shared-JVM `getOrCreate` usually returns one. */
  def install(s: SparkSession): SparkSession = {
    if (!s.experimental.extraOptimizations.exists(_.isInstanceOf[graft.plans.RangeJoinRule]))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ graft.plans.RangeJoinRule()
    if (!s.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    s
  }

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    install(s)
  }
}
