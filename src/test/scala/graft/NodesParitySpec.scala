package graft

import graft.api.{Channel, Nodes}
import graft.model.Msg
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Port-parity: a pypeman-style pipeline written with reference-named node
  * constructors runs end to end. */
class NodesParitySpec extends SparkSpec {
  import spark.implicits._

  test("pypeman-named pipeline: json → map → csv out") {
    val in = Seq("""{"id": 1, "name": "ann"}""", """{"id": 2, "name": "bob"}""")
      .toDF("payload")
      .withColumn("meta", map().cast(MapType(StringType, StringType)))
      .withColumn("ctx", map().cast(Msg.ctxType))

    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val out = Channel("port")
      .add(
        Nodes.JsonToPython(schema),
        Nodes.FuncNode("noop")(identity),
        Nodes.MsgFuncNode("flatten")(df => df.select(col("payload.*"), col("meta"), col("ctx"))))
      .add(Nodes.Python2CSVstr(Seq(col("id"), upper(col("name")))))
      .runMain(in)
      .select("payload").as[String].collect().sorted.toSeq
    assert(out == Seq("1,ANN", "2,BOB"))
  }

  test("pypeman-named pipeline: b64 + encode roundtrip") {
    val in = Seq("hello").toDF("payload")
    val out = Channel("rt")
      .add(Nodes.Encode(), Nodes.B64Encode(), Nodes.B64Decode(), Nodes.Decode())
      .runMain(in).select("payload").as[String].head()
    assert(out == "hello")
  }

  test("pypeman-named pipeline: hl7 parse picks segments") {
    val in = Seq("MSH|^~&|APP\rPID|7|Doe").toDF("payload")
    val out = Channel("hl7").add(Nodes.HL7ToPython()).runMain(in)
      .select(element_at(element_at(col("payload"), 2), 3).as("name"))
      .as[String].head()
    assert(out == "Doe")
  }

  test("fail-path parity: malformed JSON routes to rejects (fail_nodes)") {
    val in = Seq("""{"id": 1}""", "not json at all").toDF("payload")
    val schema = StructType(Seq(StructField("id", LongType)))
    val r = Channel("failpath")
      .add(Nodes.JsonToPython(schema))
      .rejectWhen(col("payload").isNull || col("payload.id").isNull)
      .run(in)
    assert(r.main.count() == 1)
    assert(r.rejected.get.count() == 1)
  }

  test("SQL surface: native vector functions callable from spark.sql") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine", es => graft.plans.CosineSimilarity(es(0), es(1)), "scala_udf")
    val c = spark.sql(
      "SELECT vec_cosine(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS c")
      .as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
    // and through the Column API with mixed float/double arrays
    val df = Seq((Array(1.0f, 0.0f), Array(1.0, 0.0))).toDF("a", "b")
    val c2 = df.select(graft.plans.VectorFunctions.vecCosine(col("a"), col("b")))
      .as[Double].head()
    assert(math.abs(c2 - 1.0) < 1e-12)
  }

  test("Drop/Reject channel-level routing") {
    val in = Seq(1, 2, 3, 4).toDF("payload")
    val r = Nodes.Drop(col("payload") > 3)(
      Nodes.Reject(col("payload") === 1)(Channel("dr"))).run(in)
    assert(r.main.as[Int].collect().sorted.toSeq == Seq(2, 3))
    assert(r.dropped.get.count() == 1 && r.rejected.get.count() == 1)
  }
}
