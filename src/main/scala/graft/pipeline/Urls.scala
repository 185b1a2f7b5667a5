package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and host-level deduplication — the web-crawl
  * curation steps that precede content dedup: the same page arrives under
  * `HTTP://Example.com:80/a?utm_source=feed#top` and `http://example.com/a`,
  * and a crawl's per-host document counts drive both politeness budgeting
  * and boilerplate-host drops.
  *
  * Everything here is MAP-SIDE column algebra over RE2-compatible regexes
  * (no lookbehind/backtracking — the [[Redaction]] rule), so the operators
  * compose onto streams statelessly, ride whole-stage codegen, and replay
  * exactly in any RE2-family engine. Canonicalization steps (the common
  * core of the published crawl recipes):
  *
  *   1. strip the `#fragment`;
  *   2. strip tracking parameters (`utm_*`, `gclid`, `fbclid`) and repair
  *      the separators they leave behind;
  *   3. lowercase the scheme and host (paths stay case-sensitive);
  *   4. strip the scheme's default port (`:80` http, `:443` https).
  *
  * Non-URL strings (no `scheme://`) canonicalize to themselves minus
  * fragment/tracking — garbage in, unchanged garbage out, never null.
  */
object Urls {

  // case-insensitive: crawls carry UTM_Source/Gclid casings too, and a
  // case-split here would leave two canonical forms for one page
  private val trackingParams = "(?i)([?&])(?:utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*"

  /** The canonical form of a URL column (see steps above). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // strip tracking params keeping their leading separator, then repair:
    // "&&"-runs collapse, "?&" becomes "?", a dangling "?"/"&" drops.
    // The repair runs ONLY when a tracking param was actually removed —
    // it exists to fix the holes the removal leaves, and running it
    // unconditionally would mutate strings it has no business touching
    // ("is it true?" → "is it true", a legitimate bare-"?" empty query)
    val stripped = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(noFrag, trackingParams, "$1"),
          "&&+", "&"),
        "\\?&", "?"),
      "[?&]$", "")
    val noTrack = when(noFrag.rlike(trackingParams), stripped).otherwise(noFrag)
    val scheme = regexp_extract(noTrack, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    val hostport = regexp_extract(noTrack, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val rest = regexp_extract(noTrack, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val canonHost = when(lower(scheme) === "http", regexp_replace(lower(hostport), ":80$", ""))
      .when(lower(scheme) === "https", regexp_replace(lower(hostport), ":443$", ""))
      .otherwise(lower(hostport))
    when(scheme === "", noTrack)
      .otherwise(concat(lower(scheme), lit("://"), canonHost, rest))
  }

  /** The registrable host of a URL column: userinfo stripped, lowercased,
    * port stripped, leading `www.` stripped. Empty string for non-URLs.
    *
    * The userinfo strip removes everything through the LAST `@` of the
    * authority (the browser rule): `https://evil.com@victim.com/x` keys as
    * `victim.com`, and a crawler-controlled `a@b@host` confusable cannot
    * smuggle a fake host either — without this, hostile userinfo would
    * break [[surtKey]]'s same-domain contiguity and misgroup frontier URLs.
    */
  def hostOf(url: Column): Column =
    regexp_replace(
      regexp_replace(
        lower(regexp_replace(
          regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
          "^.*@", "")),
        ":[0-9]+$", ""),
      "^www\\.", "")

  /** The SURT (Sort-friendly URI Reordering Transform) key of a URL column —
    * the canonical frontier/index key the web-archive ecosystem uses
    * (Common Crawl's URL indexes are SURT-ordered): scheme dropped, host
    * lowercased with port and leading `www.` stripped (the [[hostOf]]
    * rules), host labels REVERSED and comma-joined, then `)` and the
    * original path+query. `http://WWW.News.Example.com:80/a?q` →
    * `com,example,news)/a?q`. Reversed-host order sorts one registrable
    * domain's URLs adjacent, which is what makes range-partitioned
    * frontier dedup and per-domain scans contiguous at archive scale.
    * Non-URL strings (no `scheme://`) pass through unchanged, the
    * [[canonicalizeUrl]] convention. Pure column algebra — map-side,
    * codegen, replayable by any engine with split/reverse/join.
    */
  def surtKey(url: Column): Column = {
    val host = hostOf(url)
    val rest = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    when(host === "", url)
      .otherwise(concat(array_join(reverse(split(host, "\\.")), ","), lit(")"), rest))
  }

  /** [[surtKey]] from an already-split (host, path) pair — the form the
    * frontier/schedule composition uses once [[hostOf]] has normalized the
    * host: reversed comma-joined host labels + `)` + path. Null-safe via
    * the callers' own host-null exclusion.
    */
  def surtOf(host: Column, path: Column): Column =
    concat(array_join(reverse(split(host, "\\.")), ","), lit(")"), coalesce(path, lit("")))

  /** JVM-string mirror of [[surtKey]] — same transform, same non-URL
    * pass-through — for executor-side record processing that never enters
    * a plan (the [[graft.sources.WarcSink]] CDX index writes one urlkey
    * per archived record). A property spec pins column/string agreement.
    */
  def surtKeyString(url: String): String = {
    if (url == null) return ""
    val m = java.util.regex.Pattern
      .compile("^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)").matcher(url)
    if (!m.find()) return url
    val authority = m.group(1)
    val at = authority.lastIndexOf('@')
    var host = (if (at >= 0) authority.substring(at + 1) else authority)
      .toLowerCase(java.util.Locale.ROOT)
    host = host.replaceFirst(":[0-9]+$", "").replaceFirst("^www\\.", "")
    if (host.isEmpty) return url
    val rest = url.substring(m.end(1))
    host.split("\\.", -1).reverse.mkString(",") + ")" + rest
  }

  /** Host-level dedup: one row per host with the representative (minimum)
    * id and the document count — [[Dedup.exact]]'s shape keyed on
    * [[hostOf]] instead of content. One hash groupBy on the (short) host
    * string; linear at corpus scale. Use the result's `keep_id` to semi-join
    * survivors, or its `n_docs` to cut boilerplate hosts.
    *
    * Rows WITHOUT a parseable host (no `scheme://` — empty/relative/garbage
    * url fields) are EXCLUDED: they are not host-duplicates of each other,
    * and grouping them under one "" host would silently collapse a whole
    * shard of missing-url docs to a single survivor in the semi-join usage.
    */
  def dedupByHost(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs.select(col(idCol), hostOf(col(urlCol)).as("host"))
      .filter(col("host") =!= "")
      .groupBy(col("host"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))
      .select(col("host"), col("keep_id"), col("n_docs"))
}
