package graft

import org.apache.spark.sql.functions._

/** The engine's SQL face: the same tables and operators via spark.sql. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("TPC-H Q1 shape via spark.sql equals the DataFrame plan") {
    Tables(spark, sf).lineitem.createOrReplaceTempView("lineitem_v")
    val sql = spark.sql("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 4) AS sum_qty,
             count(*) AS count_order
      FROM lineitem_v
      WHERE l_shipdate <= DATE '1998-09-02'
      GROUP BY l_returnflag, l_linestatus""")
    val df = Queries.q1Agg.run(spark, sf)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
    assert(sql.except(df).count() == 0 && df.except(sql).count() == 0)
  }

  test("store search predicate via SQL view") {
    Tables(spark, sf).events.createOrReplaceTempView("events_v")
    val n = spark.sql(
      "SELECT count(*) FROM events_v WHERE event_type = 'error' AND value > 50")
      .as[Long].head()
    val df = Tables(spark, sf).events
      .filter(col("event_type") === "error" && col("value") > 50).count()
    assert(n == df && n > 0)
  }
}
