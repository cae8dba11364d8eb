package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection aid: print the formatted physical plan of named
  * registry queries (all of SURVEY §2's plan-audit work — pushed filters,
  * ReadSchema, WholeStageCodegen spans, broadcast vs shuffle joins — reads
  * off this output). Usage: `runMain graft.ExplainTool q_lang_id [more…]`
  * with `SPARK_GRAFT_SF_DIR` selecting the data (default sf0.01). */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainTool <query name>…")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4))
      .getOrCreate()
    GraftSession.install(spark)
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      println(s"==== $name ====")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
