package graft.net

import graft.api.Node
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** One HTTP exchange, as plain data. */
final case class HttpRequest(
    method: String,
    url: String,
    headers: Map[String, String] = Map.empty,
    body: Option[String] = None)

final case class HttpResponse(
    status: Int,
    body: String,
    headers: Map[String, String] = Map.empty,
    finalUrl: Option[String] = None) {
  def url(req: HttpRequest): String = finalUrl.getOrElse(req.url)
}

/** Pluggable request transport — the seam that makes graft's HttpRequest
  * node testable without a network (reference: contrib/http.py:185 does
  * aiohttp I/O inline; graft splits "build the request" — pure columns —
  * from "send it" — this trait, executed partition-parallel on executors).
  *
  * Implementations must be Serializable: one instance is shipped to each
  * task, and any heavy client state must be lazy/transient so it is created
  * per-executor, not serialized from the driver.
  */
trait HttpTransport extends Serializable {
  def send(req: HttpRequest): HttpResponse
}

/** In-process transport backed by a plain handler function — the zero-egress
  * test double (the reference's tests monkeypatch aiohttp the same way). */
final case class MockTransport(handler: HttpRequest => HttpResponse) extends HttpTransport {
  def send(req: HttpRequest): HttpResponse = handler(req)
}

/** Real transport over `java.net.http.HttpClient` (JDK built-in, no extra
  * dependency). The client is created lazily once per executor JVM and
  * shared by that executor's tasks; per-partition parallelism bounds the
  * number of in-flight requests exactly like the reference's one-session-
  * per-request model bounds asyncio concurrency. */
object JdkHttpTransport extends HttpTransport {
  @transient private lazy val client = java.net.http.HttpClient.newBuilder()
    .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
    .build()

  def send(req: HttpRequest): HttpResponse = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(req.url))
    req.headers.foreach { case (k, v) => b.header(k, v) }
    val publisher = req.body
      .map(java.net.http.HttpRequest.BodyPublishers.ofString)
      .getOrElse(java.net.http.HttpRequest.BodyPublishers.noBody())
    val r = b.method(req.method.toUpperCase, publisher).build()
    val resp = client.send(r, java.net.http.HttpResponse.BodyHandlers.ofString())
    val hdrs = {
      import scala.jdk.CollectionConverters._
      resp.headers().map().asScala.map { case (k, vs) => k -> vs.asScala.mkString(",") }.toMap
    }
    HttpResponse(resp.statusCode(), resp.body(), hdrs, Some(resp.uri().toString))
  }
}

/** The HttpRequest node (contrib/http.py:185) — Spark-first shape:
  *
  *   1. request construction is pure column work fused into the scan: URL
  *      template expansion (`%(key)s` — reference str_named_param_regex),
  *      query-string params, method/header resolution with the reference's
  *      choose_first_not_none order (node config, then msg.meta);
  *   2. the I/O hop is a single `mapPartitions` over the prepared rows —
  *      partition-parallel, client init amortized per executor, the same
  *      batched-side-effect shape as the multimodal decoder.
  *
  * Response mapping mirrors contrib/http.py:357-374 `process`: payload :=
  * response body, meta.status_code / meta.url set, headers added to meta
  * when `addMeta`.
  */
object Http {

  /** Reference str_named_param_regex (contrib/http.py:23): `%(key)s|r|d`. */
  private val namedParam = """%\(([^)]*)\)[rsd]""".r

  /** Expand a `%(key)s` URL template into a concat of literals and column
    * lookups. Key resolution (old_url_parsing, contrib/http.py:240-257):
    * plain keys read msg.meta; `payload.key` reads the JSON payload; a
    * `meta.` prefix is tolerated-and-stripped exactly like the reference
    * (contrib/http.py:231-237). Keys matching a top-level column use it
    * directly — the graft lift for domain (non-Msg) rows.
    */
  def expandTemplate(template: String, df: DataFrame): Column = {
    val cols = df.columns.toSet
    def keyCol(key: String): Column = {
      val k = if (key.startsWith("meta.")) key.stripPrefix("meta.") else key
      if (k.startsWith("payload."))
        get_json_object(col("payload"), "$." + k.stripPrefix("payload."))
      else if (cols.contains(k)) col(k).cast("string")
      else element_at(col("meta"), k)
    }
    val ms = namedParam.findAllMatchIn(template).toVector
    if (ms.isEmpty) lit(template)
    else {
      val parts = Vector.newBuilder[Column]
      var pos = 0
      ms.foreach { m =>
        if (m.start > pos) parts += lit(template.substring(pos, m.start))
        parts += keyCol(m.group(1))
        pos = m.end
      }
      if (pos < template.length) parts += lit(template.substring(pos))
      concat(parts.result(): _*)
    }
  }

  /** Partition-parallel HTTP request node over a Msg-shaped DataFrame
    * (needs `payload` string + `meta` map columns).
    *
    * @param transport the I/O seam ([[MockTransport]] in tests,
    *                  [[JdkHttpTransport]] for real calls)
    * @param url       URL template; null → msg.meta('url') (reference
    *                  generate_request_url fallback)
    * @param method    null → msg.meta('method'), then 'get'
    * @param headers   static request headers
    * @param params    query-string params appended to the URL
    * @param addMeta   also merge response headers into msg.meta
    */
  def request(
      transport: HttpTransport,
      url: String = null,
      method: String = null,
      headers: Map[String, String] = Map.empty,
      params: Seq[(String, Column)] = Nil,
      addMeta: Boolean = false): Node = Node("HttpRequest") { df =>
    val urlBase =
      if (url != null) expandTemplate(url, df)
      else element_at(col("meta"), "url")
    val qs = params.map { case (k, v) =>
      concat(lit(k + "="), url_encode(v.cast("string")))
    }
    val urlCol = if (qs.isEmpty) urlBase
      else concat(urlBase, lit("?"), concat_ws("&", qs: _*))
    val methodCol = upper(coalesce(
      if (method != null) lit(method) else element_at(col("meta"), "method"),
      lit("GET")))
    // only write methods carry the payload as request body (http.py:325-327)
    val bodyCol = when(methodCol.isin("PUT", "POST", "PATCH"), col("payload"))

    val prep = df
      .withColumn("__http_m", methodCol)
      .withColumn("__http_u", urlCol)
      .withColumn("__http_b", bodyCol)
    val schema = prep.schema
    val mIdx = schema.fieldIndex("__http_m")
    val uIdx = schema.fieldIndex("__http_u")
    val bIdx = schema.fieldIndex("__http_b")
    val pIdx = schema.fieldIndex("payload")
    val metaIdx = schema.fieldIndex("meta")
    val staticHeaders = headers

    val sent = prep.mapPartitions { rows =>
      // per-partition: transport client state initializes here, once
      rows.map { row =>
        val req = HttpRequest(
          method = row.getString(mIdx),
          url = row.getString(uIdx),
          headers = staticHeaders,
          body = if (row.isNullAt(bIdx)) None else Some(row.getString(bIdx)))
        val resp = transport.send(req)
        val oldMeta = if (row.isNullAt(metaIdx)) Map.empty[String, String]
          else row.getMap[String, String](metaIdx).toMap
        val newMeta = oldMeta ++
          Map("status_code" -> resp.status.toString, "url" -> resp.url(req)) ++
          (if (addMeta) resp.headers.map { case (k, v) => "header_" + k -> v }
           else Map.empty)
        val vals = row.toSeq.toArray
        vals(pIdx) = resp.body
        vals(metaIdx) = newMeta
        Row.fromSeq(vals.toIndexedSeq)
      }
    }(Encoders.row(schema))
    sent.drop("__http_m", "__http_u", "__http_b")
  }

  /** Lift a domain DataFrame into the minimal Msg shape `request` needs. */
  def asRequests(df: DataFrame, meta: (String, Column)*): DataFrame = {
    val metaCol =
      if (meta.isEmpty) map().cast(MapType(StringType, StringType))
      else map(meta.flatMap { case (k, v) => Seq(lit(k), v.cast("string")) }: _*)
    val base = if (df.columns.contains("payload")) df
      else df.withColumn("payload", lit(null).cast("string"))
    base.withColumn("meta", metaCol)
  }
}
