package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection main: print the formatted physical plan of registry
  * queries without executing them (the PLANS.md evidence loop).
  *
  * Usage: `sbt "runMain graft.Explain q_winnow [q_other ...]"`;
  * env `SPARK_GRAFT_SF_DIR` picks the table directory (default sf0.01).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Explain <query_name> [more...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val unknown = args.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    args.foreach { name =>
      println(s"==== $name ====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
