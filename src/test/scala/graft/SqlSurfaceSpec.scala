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

  test("GraftExtensions registers every native expression as a SQL function") {
    // same injection path as spark.sql.extensions=graft.plans.GraftExtensions,
    // applied to the already-built session via the function registry
    val ext = new graft.plans.GraftExtensions
    val reg = spark.sessionState.functionRegistry
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    // mirror injectFunction on the live session
    Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression)](
      "nearest_centroid" -> (es => graft.plans.NearestCentroid(es(0), es(1), es(2))),
      "nearest_centroids" -> (es => graft.plans.NearestCentroids(es(0), es(1), es(2), es(3).eval().asInstanceOf[Int])),
      "word_shingles" -> (es => graft.plans.WordShingles(es(0), es(1).eval().asInstanceOf[Int])),
      "repetition_profile" -> (es => graft.plans.RepetitionProfile(es(0), es(1).eval().asInstanceOf[Int])),
      "simhash64" -> (es => graft.plans.SimHash64(es(0))),
      "jpeg_meta" -> (es => graft.plans.JpegMeta(es(0))),
      "greedy_pieces" -> (es => graft.plans.GreedyPieces(es(0),
        es(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.toString).toSeq)),
      "merge_pair" -> (es => graft.plans.MergePair(es(0),
        es(1).eval().toString, es(2).eval().toString)),
      "vec_mean" -> (es => graft.plans.VecMean(es(0))),
      "lcp_at" -> (es => graft.plans.LcpAt(es(0), es(1), es(2)))
    ).foreach { case (n, b) => reg.createOrReplaceTempFunction(n, b, "scala_udf") }

    val cid = spark.sql(
      """SELECT nearest_centroid(array(0.9D, 0.1D),
        |  array(array(0.0D, 0.0D), array(1.0D, 0.0D)), array(7L, 9L)) AS cid"""
        .stripMargin).as[Long].head()
    assert(cid == 9L) // (0.9,0.1) is nearer centroid (1,0) → cid 9
    val cids = spark.sql(
      """SELECT nearest_centroids(array(0.9D, 0.1D),
        |  array(array(0.0D, 0.0D), array(1.0D, 0.0D)), array(7L, 9L), 2) AS cids"""
        .stripMargin).as[Seq[Long]].head()
    assert(cids == Seq(9L, 7L)) // rank order: nearest first
    val sh = spark.sql(
      "SELECT word_shingles('a b c d', 2) AS sh").as[Seq[String]].head()
    assert(sh == Seq("a b", "b c", "c d"))
    val rep = spark.sql(
      "SELECT repetition_profile('x x x', 2).top_ngram_n AS t").as[Long].head()
    assert(rep == 2L) // "x x" twice
    // minimal SOI + SOF0 stream, 16x8
    val jm = spark.sql(
      """SELECT jpeg_meta(unhex('FFD8FFC000110800080010' ||
        |'03011100021101031101')).width AS w""".stripMargin).as[Long].head()
    assert(jm == 16L)
    val gp = spark.sql(
      "SELECT greedy_pieces('thex', array('the', 't', 'h')) AS p")
      .as[Seq[String]].head()
    assert(gp == Seq("the", "<unk>")) // longest-match, then unk for 'x'
    val mp = spark.sql(
      "SELECT merge_pair(array('a', 'b', 'a', 'b', 'c'), 'a', 'b') AS m")
      .as[Seq[String]].head()
    assert(mp == Seq("ab", "ab", "c"))
    val vm = spark.sql(
      """SELECT g, vec_mean(v) AS m FROM VALUES
        |  (1, array(1.0D, 3.0D)), (1, array(3.0D, 5.0D)) AS t(g, v)
        |GROUP BY g""".stripMargin)
      .select("m").as[Seq[Double]].head()
    assert(vm == Seq(2.0, 4.0))
    val lcp = spark.sql(
      "SELECT lcp_at('banana', 2L, 4L) AS l").as[Long].head()
    assert(lcp == 3L) // "anana" vs "ana" share "ana"
    assert(ext != null)
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
