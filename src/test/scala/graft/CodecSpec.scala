package graft

import graft.functions.Codecs._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CodecSpec extends SparkSpec {
  import spark.implicits._

  private def one = Seq(1).toDF("i")

  test("json roundtrip") {
    val df = Seq((7L, "click")).toDF("id", "kind")
    val j = df.select(jsonFormat(col("id"), col("kind")).as("p"))
    assert(j.as[String].head() == """{"id":7,"kind":"click"}""")
    val schema = StructType(Seq(StructField("id", LongType), StructField("kind", StringType)))
    val back = j.select(jsonParse(col("p"), schema).as("s")).select("s.*")
    assert(back.as[(Long, String)].head() == ((7L, "click")))
    assert(j.select(jsonGet(col("p"), "$.kind")).as[String].head() == "click")
  }

  test("base64 roundtrip") {
    val df = Seq("héllo wörld").toDF("s")
    val rt = df.select(decodeText(b64Decode(b64Encode(encodeText(col("s"))))).as("r"))
    assert(rt.as[String].head() == "héllo wörld")
  }

  test("csv format + parse with custom delimiter") {
    val df = Seq((1, "a;x", "b")).toDF("id", "v1", "v2")
    // note: naive concat_ws does not quote; parse splits on raw delimiter
    val line = df.select(csvFormat("|", col("id"), col("v1"), col("v2")).as("l"))
    assert(line.as[String].head() == "1|a;x|b")
    val schema = StructType(Seq(StructField("id", IntegerType),
      StructField("v1", StringType), StructField("v2", StringType)))
    val parsed = line.select(csvParse(col("l"), schema, "|").as("s")).select("s.*")
    assert(parsed.as[(Int, String, String)].head() == ((1, "a;x", "b")))
  }

  test("xml format + xpath extract") {
    val df = Seq(("Ann", 42)).toDF("name", "age")
    val xml = df.select(xmlFormat("person", "name" -> col("name"), "age" -> col("age")).as("x"))
    assert(xml.as[String].head() == "<person><name>Ann</name><age>42</age></person>")
    assert(xml.select(xmlExtract(col("x"), "/person/age")).as[String].head() == "42")
  }

  test("hl7 format + field access") {
    val df = Seq(("P123", "Doe")).toDF("pid", "name")
    val msg = hl7Format(Seq(
      Seq(lit("MSH"), lit("^~&"), lit("APP")),
      Seq(lit("PID"), col("pid"), col("name"))))
    val out = df.select(msg.as("m"),
      hl7Field(msg, 1, 2).as("f"), hl7Field(msg, 0, 0).as("seg"))
    val r = out.head()
    assert(r.getAs[String]("m") == "MSH|^~&|APP\rPID|P123|Doe")
    assert(r.getAs[String]("f") == "Doe")
    assert(r.getAs[String]("seg") == "MSH")
  }

  test("hl7Ack swaps apps and echoes control id") {
    val df = Seq("MSH|^~&|SENDER||RECEIVER|||20240101|ADT^A01|MSG007|P|2.5\rPID|1|X").toDF("m")
    val ack = df.select(hl7Ack(col("m"), "AA")).as[String].head()
    assert(ack == "MSH|^~\\&|RECEIVER||SENDER||||ACK|MSG007|P|2.5\rMSA|AA|MSG007")
  }

  test("httpUrl url-encodes params") {
    val df = Seq("a value&more").toDF("v")
    val u = df.select(httpUrl("http://h/p", "q" -> col("v")).as("u")).as[String].head()
    assert(u == "http://h/p?q=a+value%26more")
  }

  test("emailFormat renders RFC-822 text") {
    val m = one.select(emailFormat(lit("S"), lit("f@x"), lit("t@y"), lit("B")).as("m"))
      .as[String].head()
    assert(m == "Subject: S\r\nFrom: f@x\r\nTo: t@y\r\n\r\nB")
  }
}
