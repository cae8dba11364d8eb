package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base for all suites (one JVM-wide session via
  * getOrCreate; lazy so suites that never touch Spark don't pay). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(8)
  val sf: String = "/root/testdata/sf0.001"
}
