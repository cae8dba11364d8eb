package graft

import graft.ops.SkewOps
import org.apache.spark.sql.functions._

class SkewSketchSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the rows of a plain inner join") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 1 else i, s"v$i"))
      .toDF("k", "payload") // key 1 is hot (10% of rows)
    val dim = Seq((1, "hot"), (2, "a"), (3, "b"), (77, "c")).toDF("k", "label")
    val salted = SkewOps.saltedJoin(big, dim, "k", salts = 4)
    val plain = big.join(dim, Seq("k"), "inner")
    assert(salted.count() == plain.count())
    assert(salted.groupBy("k").count().orderBy("k").collect().toSeq ==
      plain.groupBy("k").count().orderBy("k").collect().toSeq)
  }

  test("adaptiveSaltedJoin: row-equivalent, only hot keys replicate the dim side") {
    val big = (1 to 1000).map(i => (if (i % 10 == 0) 1 else i, i.toLong))
      .toDF("k", "rid") // key 1 is hot (10% of rows); tail keys are singletons
    val dim = Seq((1, "hot"), (2, "a"), (3, "b"), (77, "c")).toDF("k", "label")
    val out = SkewOps.adaptiveSaltedJoin(
      big, dim, "k", col("rid"), salts = 4, hotMinCount = 50L)
    val plain = big.join(dim, Seq("k"), "inner")
    assert(out.count() == plain.count())
    assert(out.groupBy("k").count().orderBy("k").collect().toSeq ==
      plain.groupBy("k").count().orderBy("k").collect().toSeq)
    // hot rows actually spread over multiple salts (not all in bucket 0)
    val hotSalts = big.filter(col("k") === 1)
      .withColumn("__salt", pmod(
        conv(substring(md5(col("rid").cast("string")), 1, 15), 16, 10)
          .cast("long"), lit(4L)))
      .select("__salt").distinct().count()
    assert(hotSalts > 1, "hot key must fan out over salts")
    // determinism: identical output across runs (md5 salt, no rand())
    val again = SkewOps.adaptiveSaltedJoin(
      big, dim, "k", col("rid"), salts = 4, hotMinCount = 50L)
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
  }

  test("adaptiveSaltedJoin: NULL saltSource on a hot-key row is kept, not dropped") {
    // 60 hot-key rows, one with a NULL rid: md5(NULL) is NULL, and an
    // uncoalesced salt would silently drop that row from the inner join.
    val big = ((1 to 60).map(i => (1, Some(i.toLong))) :+ ((1, None)) :+
      ((2, Some(999L)))).toDF("k", "rid")
    val dim = Seq((1, "hot"), (2, "a")).toDF("k", "label")
    val out = SkewOps.adaptiveSaltedJoin(
      big, dim, "k", col("rid"), salts = 4, hotMinCount = 50L)
    val plain = big.join(dim, Seq("k"), "inner")
    assert(out.count() == plain.count(),
      "NULL saltSource must land in bucket 0, preserving row-equivalence")
  }

  test("skewReport surfaces the hot key with its share") {
    val big = (1 to 100).map(i => (if (i <= 40) 7 else i, "x")).toDF("k", "v")
    val top = SkewOps.skewReport(big, "k", 1).head()
    assert(top.getAs[Int]("k") == 7)
    assert(top.getAs[Double]("share") == 0.4)
  }

  test("sketch aggregates stay within HLL/quantile error bounds") {
    // q_sketch now emits verdict rows (the oracle-graduation pattern);
    // every bound must verify true, and the exact side must match a
    // directly-computed countDistinct
    val r = Queries.qSketch.run(spark, sf)
    val exact = Tables(spark, sf).events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val joined = r.join(exact, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { row =>
      assert(row.getAs[Long]("n_exact") == row.getAs[Long]("exact_users"))
      assert(row.getAs[Boolean]("hll_ok"), s"HLL outside 3-sigma bound: $row")
      assert(row.getAs[Boolean]("p50_ok"), s"p50 outside rank bound: $row")
      assert(row.getAs[Boolean]("p99_ok"), s"p99 outside rank bound: $row")
    }
  }
}
