package graft

import graft.net.{Http, HttpResponse, MockTransport}
import org.apache.spark.sql.functions._
import Queries.Q

/** Queries exercising the HTTP connector (§2.2 #31 / contrib/http.py:185).
  *
  * The transport is the in-process [[MockTransport]] — a deterministic
  * request→response function, so the whole exchange (URL templating, query
  * params, partition-parallel send, response→payload/meta mapping) is
  * oracle-checkable in DuckDB by replicating the handler's arithmetic in
  * SQL. The I/O seam itself is what `JdkHttpTransport` plugs into at
  * deploy time (HttpSpec drives it against an in-process JDK HttpServer).
  */
object NetQueries {

  /** Deterministic in-process "service": GET /orders/<k>?seg=<k%5> →
    * 200 + JSON for most orders, 404 for keys ending in 7. */
  val orderService: MockTransport = MockTransport { req =>
    val path = req.url.substring(0, req.url.indexOf('?'))
    val k = path.substring(path.lastIndexOf('/') + 1).toLong
    if (k % 10 == 7)
      HttpResponse(404, s"""{"error":"order $k not found"}""")
    else
      HttpResponse(200, s"""{"order":$k,"total_cents":${k * 100}}""")
  }

  /** Full request/response round-trip over the mock transport: build URLs
    * from a template + params column-side (fused into the scan), send
    * partition-parallel, map status/body back into meta/payload. */
  val qHttpRoundtrip = Q(
    "q_http_roundtrip",
    (s, dir) => {
      val orders = Tables(s, dir).orders
        .filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"))
      val node = Http.request(
        transport = orderService,
        url = "http://api.local/orders/%(o_orderkey)s",
        params = Seq("seg" -> col("o_orderkey") % 5))
      node(Http.asRequests(orders))
        .select(
          col("o_orderkey"),
          element_at(col("meta"), "url").as("url"),
          element_at(col("meta"), "status_code").cast("long").as("status_code"),
          col("payload"))
    },
    Some("""SELECT o_orderkey,
              'http://api.local/orders/' || o_orderkey || '?seg=' || (o_orderkey % 5) AS url,
              CAST(CASE WHEN o_orderkey % 10 = 7 THEN 404 ELSE 200 END AS BIGINT) AS status_code,
              CASE WHEN o_orderkey % 10 = 7
                THEN '{"error":"order ' || o_orderkey || ' not found"}'
                ELSE '{"order":' || o_orderkey || ',"total_cents":' || (o_orderkey * 100) || '}'
              END AS payload
            FROM orders WHERE o_orderkey % 7 = 0"""))

  def all: Seq[Q] = Seq(qHttpRoundtrip)
}
