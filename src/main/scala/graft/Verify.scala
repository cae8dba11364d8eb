package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: regex filter over query names (local iteration);
    // the driver's 2-arg invocation runs everything
    val (sfDir, outDir, nameFilter) = args match {
      case Array(a, b)    => (a, b, ".*")
      case Array(a, b, f) => (a, b, f)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    GraftSession.install(spark)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // run queries concurrently (Spark schedules jobs from multiple threads
    // fine); 4-way keeps executor slots busy across per-query stragglers
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "4").toInt)
    // A query that throws must never silently vanish from the round's
    // correctness report: record the error AND write a sentinel one-row
    // parquet in its slot, so the driver's compare still emits a (red) row
    // for the name instead of dropping it.
    val errors = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val tasks = SparkEntry.queries.toSeq
      .filter { case (name, _) => name.matches(nameFilter) }
      .map { case (name, fn) =>
      pool.submit(new Runnable {
        def run(): Unit =
          try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          catch { case e: Throwable =>
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            errors.put(name, msg)
            System.err.println(s"[verify] $name failed: $msg")
            try {
              import spark.implicits._
              Seq(("GRAFT_QUERY_ERROR", msg.take(500)))
                .toDF("graft_error", "graft_error_detail")
                .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
            } catch { case _: Throwable => () }
          }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Machine-readable per-query failure map (empty object when all green)
    // — lets the driver merge errors into the correctness JSON directly.
    import scala.jdk.CollectionConverters._
    val errJson = errors.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    spark.stop()
  }
}
