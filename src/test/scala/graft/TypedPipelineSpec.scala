package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

case class Line(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

/** Typed Dataset[T] usage + dedup clustering semantics. */
class TypedPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("typed Dataset pipeline with case-class encoder and custom Aggregator") {
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.expressions.Aggregator
    val sumQty = new Aggregator[Line, Double, Double] {
      def zero: Double = 0.0
      def reduce(b: Double, a: Line): Double = b + a.l_quantity
      def merge(x: Double, y: Double): Double = x + y
      def finish(b: Double): Double = b
      def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }.toColumn
    val ds = Tables(spark, sf).lineitem
      .select("l_orderkey", "l_quantity", "l_returnflag").as[Line]
    val byFlag = ds.groupByKey(_.l_returnflag).agg(sumQty.name("s"))
      .collect().toMap.view.mapValues(math.round).toMap
    val untyped = Tables(spark, sf).lineitem
      .groupBy("l_returnflag").agg(sum(col("l_quantity")))
      .as[(String, Double)].collect().toMap.view.mapValues(math.round).toMap
    assert(byFlag == untyped)
  }

  test("connected components: chain and clique collapse to min-id clusters") {
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val cl = Dedup.clusters(ids, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 9L -> 9L))
  }
}
