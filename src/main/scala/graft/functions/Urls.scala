package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and URL-level dedup — the first dedup pass of a
  * web-corpus pipeline (CommonCrawl curation dedups by canonical URL
  * before any content hashing; the reference's HttpRequest builds URLs,
  * this is the inverse direction: normalizing them for identity).
  *
  * Canonical form: lowercase scheme and host, `www.` and default ports
  * stripped, trailing slashes removed, tracking parameters
  * (`utm_*`/`fbclid`/`gclid`) dropped, remaining query params sorted,
  * fragment discarded. Every step is engine-portable column math
  * (regexp_extract / regexp_replace / split / filter / sort / join), so
  * a DuckDB oracle can replicate it term for term.
  *
  * Scale shape: pure scan-stage string work fused into the read — no
  * shuffle; [[urlDedup]] adds the one unavoidable exchange on the
  * canonical-url key (uniform: hot hosts do not skew a full-URL key).
  */
object Urls {

  /** RFC-3986-ish splitter: scheme :// host[:port] path [?query] [#frag].
    * Group 1 scheme, 2 hostport, 3 path, 4 query (no '#'/'?' inside). */
  private val UrlRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"

  /** Lowercased host with `www.` and the scheme's default port removed. */
  def urlHost(url: Column): Column = {
    val scheme = lower(regexp_extract(url, UrlRe, 1))
    val hostport = regexp_replace(lower(regexp_extract(url, UrlRe, 2)), "^www\\.", "")
    when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
  }

  /** Canonical URL string (empty when `url` does not parse as absolute). */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, UrlRe, 1))
    val path = regexp_replace(regexp_extract(url, UrlRe, 3), "/+$", "")
    val params = array_sort(filter(
      split(regexp_extract(url, UrlRe, 4), "&"),
      p => length(p) > 0 && !p.rlike("^(utm_[^=]*|fbclid|gclid)=")))
    val q = array_join(params, "&")
    when(length(scheme) === 0, lit(""))
      .otherwise(concat(
        scheme, lit("://"), urlHost(url), path,
        when(length(q) > 0, concat(lit("?"), q)).otherwise(lit(""))))
  }

  /** URL-level dedup: one row per canonical URL with the smallest id kept
    * and the duplicate count — run this before any content-level pass.
    * URLs that do not parse as absolute (canonical form '') fall back to
    * the raw URL as their own key, so unparseable URLs are never merged
    * into one group (and only merge with byte-identical spellings). */
  def urlDedup(df: DataFrame, idCol: String, url: Column): DataFrame = {
    val canon = canonicalizeUrl(url)
    df.select(col(idCol).as("__id"),
        when(length(canon) === 0, url).otherwise(canon).as("url_canon"))
      .groupBy(col("url_canon"))
      .agg(min(col("__id")).as("keep_id"), count(lit(1)).as("n_dupes"))
  }
}
