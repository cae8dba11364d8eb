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

  /** URL canonicalization + URL-level dedup. Raw URLs are fabricated with
    * per-doc cosmetic variants (case, `www.`, default port, trailing
    * slash, tracking params, param order, fragment) around a shared key
    * `k = doc_id % 100`, so five raw spellings per key at sf0.01 collapse
    * to ONE canonical URL iff every canonicalization rule fires — the
    * group-by key hash-checks the whole rule battery against DuckDB. */
  val qUrlDedup = Q(
    "q_url_dedup",
    (s, dir) => {
      import graft.functions.Urls
      val k = col("doc_id") % 100
      val m3 = col("doc_id") % 3
      val raw = concat(
        when(m3 === 0, lit("HTTPS://WWW."))
          .when(m3 === 1, lit("https://www."))
          .otherwise(lit("Https://")),
        lit("src"), (k % 20).cast("string"), lit(".Example.com"),
        when(m3 === 0, lit(":443")).otherwise(lit("")),
        lit("/Docs/"), k.cast("string"),
        when(m3 === 2, lit("/")).otherwise(lit("")),
        when(col("doc_id") % 2 === 0,
            concat(lit("?utm_source=feed&id="), (k % 7).cast("string"), lit("&z=1&utm_campaign=x")))
          .otherwise(concat(lit("?z=1&id="), (k % 7).cast("string"))),
        when(col("doc_id") % 5 === 0, lit("#top")).otherwise(lit("")))
      val d = Tables(s, dir).documents.select(col("doc_id"), raw.as("url"))
      Urls.urlDedup(d, "doc_id", col("url"))
        .select(col("url_canon"),
          col("keep_id").cast("long").as("keep_id"),
          col("n_dupes").cast("long").as("n_dupes"))
    },
    Some("""WITH raw AS (
              SELECT doc_id,
                (CASE doc_id % 3 WHEN 0 THEN 'HTTPS://WWW.'
                                 WHEN 1 THEN 'https://www.'
                                 ELSE 'Https://' END)
                || 'src' || CAST((doc_id % 100) % 20 AS VARCHAR) || '.Example.com'
                || (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END)
                || '/Docs/' || CAST(doc_id % 100 AS VARCHAR)
                || (CASE WHEN doc_id % 3 = 2 THEN '/' ELSE '' END)
                || (CASE WHEN doc_id % 2 = 0
                      THEN '?utm_source=feed&id=' || CAST((doc_id % 100) % 7 AS VARCHAR) || '&z=1&utm_campaign=x'
                      ELSE '?z=1&id=' || CAST((doc_id % 100) % 7 AS VARCHAR) END)
                || (CASE WHEN doc_id % 5 = 0 THEN '#top' ELSE '' END) AS url
              FROM documents),
            parts AS (
              SELECT doc_id, url,
                lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 1)) AS scheme,
                lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 2)) AS hostport,
                regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 3) AS path,
                regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 4) AS query
              FROM raw),
            canon AS (
              SELECT doc_id,
                CASE WHEN scheme = '' THEN url  -- raw-URL fallback: unparseable URLs keep their own key
                ELSE scheme || '://'
                  || (CASE scheme
                        WHEN 'http'  THEN regexp_replace(regexp_replace(hostport, '^www\.', ''), ':80$', '')
                        WHEN 'https' THEN regexp_replace(regexp_replace(hostport, '^www\.', ''), ':443$', '')
                        ELSE regexp_replace(hostport, '^www\.', '') END)
                  || regexp_replace(path, '/+$', '')
                  || (CASE WHEN q = '' THEN '' ELSE '?' || q END)
                END AS url_canon
              FROM (
                SELECT doc_id, url, scheme, hostport, path,
                  array_to_string(list_sort(list_filter(string_split(query, '&'),
                    p -> len(p) > 0 AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid)='))), '&') AS q
                FROM parts))
            SELECT url_canon,
              CAST(min(doc_id) AS BIGINT) AS keep_id,
              CAST(count(*) AS BIGINT) AS n_dupes
            FROM canon GROUP BY url_canon"""))

  def all: Seq[Q] = Seq(qHttpRoundtrip, qUrlDedup)
}
