package graft

import graft.net._
import org.apache.spark.sql.functions._

/** HttpRequest node parity — ports the reference's request-construction
  * cases (pypeman/tests/test_nodes.py:430-530 test_httprequest_node) onto
  * the pluggable-transport node, plus a REAL I/O case driving
  * JdkHttpTransport against an in-process JDK HttpServer (no egress). */
class HttpSpec extends SparkSpec {
  import spark.implicits._

  /** Transport that echoes the request back, so column assertions see
    * exactly what was sent (the reference mocks aiohttp the same way). */
  private val echo = MockTransport { req =>
    val hdr = req.headers.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(",")
    HttpResponse(200, s"${req.method} ${req.url} body=${req.body.getOrElse("-")} hdr=$hdr")
  }

  private def oneMsg(payload: String, meta: (String, String)*) =
    Seq(payload).toDF("payload")
      .withColumn("meta",
        if (meta.isEmpty) map().cast("map<string,string>")
        else map(meta.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*))

  test("reference case 1: url template %(meta.beta)s/%(payload.alpha)s, default GET") {
    // test_nodes.py:435-447: content {"alpha": "payload_url"}, meta.beta=meta_url
    val msgs = oneMsg("""{"alpha":"payload_url"}""", "beta" -> "meta_url")
    val node = Http.request(echo, url = "http://url/%(meta.beta)s/%(payload.alpha)s")
    val out = node(msgs).select($"payload".as[String]).head()
    assert(out == "GET http://url/meta_url/payload_url body=- hdr=")
  }

  test("reference case 2: method from meta, POST carries payload as body") {
    val msgs = oneMsg("""{"alpha":"payload_url"}""",
      "beta" -> "meta_url", "method" -> "post")
    val node = Http.request(echo, url = "http://url/%(beta)s/%(payload.alpha)s")
    val out = node(msgs).select($"payload".as[String]).head()
    assert(out == """POST http://url/meta_url/payload_url body={"alpha":"payload_url"} hdr=""")
  }

  test("reference case 3: repeated param keys expand like list params") {
    // req_kwargs2: params [('zeta','un'),('zeta','deux'),('zeta','trois')]
    val msgs = oneMsg("x")
    val node = Http.request(echo, url = "http://url/p",
      params = Seq("zeta" -> lit("un"), "zeta" -> lit("deux"), "zeta" -> lit("trois")))
    val out = node(msgs).select($"payload".as[String]).head()
    assert(out == "GET http://url/p?zeta=un&zeta=deux&zeta=trois body=- hdr=")
  }

  test("reference case 4: node-config method/headers win over meta (choose_first_not_none)") {
    val msgs = oneMsg("data", "method" -> "get")
    val node = Http.request(echo, url = "http://url/p", method = "post",
      headers = Map("args_headers" -> "args_headers"))
    val out = node(msgs).select($"payload".as[String]).head()
    assert(out == "POST http://url/p body=data hdr=args_headers=args_headers")
  }

  test("url falls back to msg.meta('url') when node has none") {
    val msgs = oneMsg("x", "url" -> "http://from-meta/z")
    val out = Http.request(echo)(msgs).select($"payload".as[String]).head()
    assert(out == "GET http://from-meta/z body=- hdr=")
  }

  test("response status/url land in meta; addMeta merges response headers") {
    val t = MockTransport(req => HttpResponse(404, "gone",
      headers = Map("X-Test" -> "yes"), finalUrl = Some(req.url + "#final")))
    val msgs = oneMsg("x")
    val out = Http.request(t, url = "http://u/a", addMeta = true)(msgs)
      .select($"meta"("status_code"), $"meta"("url"), $"meta"("header_X-Test"), $"payload")
      .as[(String, String, String, String)].head()
    assert(out == (("404", "http://u/a#final", "yes", "gone")))
  }

  test("partition-parallel sends preserve row identity at scale shape") {
    val reqs = Http.asRequests(
      Tables(spark, sf).orders.select($"o_orderkey").repartition(8))
    val node = Http.request(NetQueries.orderService,
      url = "http://api.local/orders/%(o_orderkey)s",
      params = Seq("seg" -> $"o_orderkey" % 5))
    val out = node(reqs)
    val bad = out.filter(
      !($"payload".contains(concat(lit(":"), $"o_orderkey", lit(",")))) &&
        !($"payload".contains(concat(lit("order "), $"o_orderkey", lit(" not")))))
    assert(bad.count() == 0)
    assert(out.count() == Tables(spark, sf).orders.count())
  }

  test("JdkHttpTransport: real HTTP round-trip against in-process server") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    try {
      server.createContext("/hello", (ex: com.sun.net.httpserver.HttpExchange) => {
        val body = s"served:${ex.getRequestURI.toString}:${ex.getRequestMethod}"
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
      server.start()
      val port = server.getAddress.getPort
      val msgs = oneMsg("x", "k" -> "42")
      val out = Http.request(JdkHttpTransport,
        url = s"http://127.0.0.1:$port/hello/%(k)s")(msgs)
        .select($"payload", $"meta"("status_code")).as[(String, String)].head()
      assert(out == (("served:/hello/42:GET", "200")))
    } finally server.stop(0)
  }
}
