package graft

import graft.functions.Urls
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalizeUrl($"u")).as[String].collect().toSeq

  test("canonicalizeUrl: case, www, default port, slash, params, fragment") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&b=2&a=1#frag")
      == Seq("https://example.com/A/b?a=1&b=2"))
    // path case is preserved; host case is not
    assert(canon("http://Host.org:80/Path") == Seq("http://host.org/Path"))
    // non-default port survives; default port only stripped for its scheme
    assert(canon("http://h.org:8080/x", "https://h.org:80/x")
      == Seq("http://h.org:8080/x", "https://h.org:80/x"))
    // all-tracking query collapses to no query at all
    assert(canon("https://h.org/p?utm_a=1&utm_b=2&gclid=z") == Seq("https://h.org/p"))
    // empty string for anything that is not an absolute URL
    assert(canon("not a url", "/relative/only", "") == Seq("", "", ""))
  }

  test("urlHost extracts the bare registrable host") {
    val h = Seq("HTTPS://WWW.News.Site.COM:443/a?x=1").toDF("u")
      .select(Urls.urlHost($"u")).as[String].head()
    assert(h == "news.site.com")
  }

  test("urlDedup collapses cosmetic variants to one canonical row") {
    val df = Seq(
      (1L, "https://www.h.org/a/?utm_s=1"),
      (2L, "HTTPS://h.org:443/a"),
      (3L, "https://h.org/a#frag"),
      (4L, "https://h.org/b")
    ).toDF("id", "url")
    val out = Urls.urlDedup(df, "id", $"url")
      .orderBy("url_canon").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("https://h.org/a", 1L, 3L), ("https://h.org/b", 4L, 1L)))
  }

  test("urlDedup never merges unparseable URLs (raw-URL fallback key)") {
    val df = Seq(
      (1L, "example.com/x"),      // scheme-less: not absolute
      (2L, "relative/path"),
      (3L, "example.com/x"),      // byte-identical to #1 → same raw key
      (4L, "https://h.org/a")
    ).toDF("id", "url")
    val out = Urls.urlDedup(df, "id", $"url")
      .orderBy("url_canon").as[(String, Long, Long)].collect().toSeq
    // distinct unparseable spellings stay distinct; identical raw
    // spellings still collapse; nothing lands on an empty-string key
    assert(out == Seq(
      ("example.com/x", 1L, 2L),
      ("https://h.org/a", 4L, 1L),
      ("relative/path", 2L, 1L)))
  }

  test("urlDedup plan: scan-stage canonicalization, single exchange") {
    val d = Tables(spark, sf).documents.select($"doc_id",
      concat(lit("https://h.org/"), $"doc_id").as("url"))
    val plan = Urls.urlDedup(d, "doc_id", $"url").queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1, s"expected exactly one exchange:\n$plan")
  }
}
