package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL parsing as pure built-in Column expressions (SURVEY.md §2.5
  * extension — domain-aware corpus curation). Everything here is
  * regexp_extract / replace / length over codegen'd builtins: no
  * UDFs, no shuffle, and the identical regexes run in the DuckDB
  * oracle, so every derived column is exactly replayable.
  */
object UrlFns {

  /** Scheme (`https` from `https://…`), empty when absent. */
  def scheme(url: Column): Column =
    regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)

  /** Normalized host: the authority with scheme, `www.` prefix,
    * port, and path/query stripped, lowercased — the canonical
    * per-site key for caps and dedup.
    */
  def host(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)),
      "^www\\.", "")

  /** Explicit port, empty when none is given. */
  def port(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]+:([0-9]+)", 1)

  /** Registered domain approximation: the last two dot-labels of the
    * host (`sub.news.example.com` → `example.com`). A production
    * build consults the public-suffix list; the two-label rule is the
    * standard fallback and is what the oracle replays.
    */
  def registeredDomain(hostCol: Column): Column =
    regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1)

  /** Top-level domain (last label) of a host. */
  def tld(hostCol: Column): Column =
    regexp_extract(hostCol, "([^.]+)$", 1)

  /** Path component (leading slash, no query/fragment), empty when
    * the URL has no path.
    */
  def path(url: Column): Column =
    regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(/[^?#]*)", 1)

  /** Directory depth of the path: number of slashes. */
  def pathDepth(url: Column): Column =
    (length(path(url)) - length(regexp_replace(path(url), "/", ""))).cast("long")

  /** Whether the URL carries a query string: a '?' BEFORE any '#' —
    * everything after the fragment marker is fragment per RFC 3986,
    * so `page#sec?note` has no query.
    */
  def hasQuery(url: Column): Column = url.rlike("^[^#]*\\?")

  /** Crawl-URL canonicalization — the normalization every URL-level
    * dedup runs first so `http://www.Example.com:80/a/?utm_source=x`
    * and `http://example.com/a` collapse to one key:
    * lowercase scheme + normalized host (www/port handling via
    * [[host]]), default ports dropped (80 on http, 443 on https;
    * other ports kept), trailing path slashes stripped, the fragment
    * dropped, and tracking parameters (`utm_*`, `ref`, `fbclid`,
    * `gclid`) removed from the query — `?` disappears when nothing
    * survives. Remaining parameters keep their original order
    * (sorting them is a policy choice this canonicalizer does not
    * impose). Pure Column ops (regexes + one array filter), so it
    * scales with the scan.
    */
  def canonicalize(url: Column): Column = {
    val sch = lower(scheme(url))
    val h = host(url)
    val p = port(url)
    val keptPort = when(
      p === "" || (sch === "http" && p === "80") || (sch === "https" && p === "443"),
      lit("")).otherwise(concat(lit(":"), p))
    val pth = regexp_replace(path(url), "/+$", "")
    // query = text between the first pre-fragment '?' and '#'/end
    val rawQuery = regexp_extract(url, "^[^#]*?\\?([^#]*)", 1)
    val keptParams = array_join(
      filter(split(rawQuery, "&"),
        kv => !(kv === "" || kv.rlike("^(utm_[^=&]*|ref|fbclid|gclid)(=|$)"))),
      "&")
    val q = when(keptParams === "", lit("")).otherwise(concat(lit("?"), keptParams))
    concat(sch, lit("://"), h, keptPort, pth, q)
  }
}
