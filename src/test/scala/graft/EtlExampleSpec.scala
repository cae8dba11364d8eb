package graft

import graft.examples.EtlExample
import org.apache.spark.sql.functions._
import java.nio.file.Files

class EtlExampleSpec extends SparkSpec {
  import spark.implicits._

  test("example app: ingest → route → enrich → store → search") {
    graft.api.Channels.clear()
    val dir = Files.createTempDirectory("graft_etl").toString
    val out = EtlExample.run(spark, sf, s"$dir/store")
    val total = Tables(spark, sf).events.count()
    assert(out.count() == total) // nothing rejected: props are well-formed
    assert(out.select("state").distinct().as[String].head() == "processed")
    // payload is JSON text again after PythonToJson
    assert(out.select(get_json_object(col("payload"), "$.k")).na.drop().count() == total)
    val found = EtlExample.recentHighK(spark, s"$dir/store")
    assert(found.count() > 0)
    assert(found.select(col("meta")("k_bucket")).as[String].collect().forall(_ == "high"))
  }
}
