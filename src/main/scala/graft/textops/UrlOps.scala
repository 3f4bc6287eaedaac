package graft.textops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** URL operations for web-corpus pipelines (the CommonCrawl-style stages
  * a training-data build runs before any text analysis): canonicalization
  * for URL-level dedup, host extraction, and registrable-domain grouping
  * for per-site aggregation/blocklisting.
  *
  * Everything here is a pure `Column` expression over Spark's
  * `try_parse_url` kernel plus regexp/array functions — codegen'd, no
  * UDF, no shuffle of its own; a malformed URL canonicalizes to null
  * (the permissive web-data convention, like the codecs).
  */
object UrlOps {

  /** Query parameters dropped during canonicalization: any `utm_*`
    * prefix plus the common click-tracking ids. Chosen from the public
    * tracking-param lists; callers can pass their own.
    */
  val DefaultTrackingExact: Seq[String] = Seq("fbclid", "gclid", "msclkid", "igshid")

  /** Suffix list for [[registrableDomain]] — a deliberately small,
    * static stand-in for the public-suffix list (the real list is data,
    * not code: load it and pass it in). Multi-label suffixes must be
    * checked before their tails, which [[registrableDomain]] enforces by
    * sorting on label count.
    */
  val DefaultSuffixes: Seq[String] =
    Seq("co.uk", "com.au", "co.jp", "com", "org", "net", "io", "edu", "gov")

  /** Canonical form of a URL: lowercase scheme and host, `www.` label
    * stripped, default ports (http:80 / https:443) removed, duplicate
    * path slashes collapsed, trailing slash stripped (empty path renders
    * as bare authority — no trailing "/"), tracking params dropped,
    * remaining query params sorted bytewise, fragment discarded.
    * Anything `try_parse_url` rejects → null.
    */
  def canonicalizeUrl(url: Column,
                      trackingExact: Seq[String] = DefaultTrackingExact): Column = {
    val proto = lower(try_parse_url(url, lit("PROTOCOL")))
    val rawHost = try_parse_url(url, lit("HOST"))
    val host = regexp_replace(lower(rawHost), "^www\\.", "")
    // HOST excludes the port; recover it from AUTHORITY (host[:port])
    val auth = try_parse_url(url, lit("AUTHORITY"))
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val defaultPort = (proto === lit("http") && port === lit("80")) ||
      (proto === lit("https") && port === lit("443"))
    val portPart = when(port === lit("") || defaultPort, lit(""))
      .otherwise(concat(lit(":"), port))
    val rawPath = coalesce(try_parse_url(url, lit("PATH")), lit(""))
    // ".../" and "..." are the same resource at the root: a lone "/"
    // canonicalizes away with the trailing slashes
    val path0 = regexp_replace(regexp_replace(rawPath, "/{2,}", "/"), "(?<=.)/$", "")
    val path = when(path0 === lit("/"), lit("")).otherwise(path0)
    val rawQuery = try_parse_url(url, lit("QUERY"))
    val kept = filter(split(rawQuery, "&"), kv => {
      val k = substring_index(kv, "=", 1)
      !(k.startsWith("utm_") || k.isin(trackingExact.map(x => x: Any): _*) ||
        kv === lit(""))
    })
    val queryPart = when(rawQuery.isNull || size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), array_join(sort_array(kept), "&")))
    when(proto.isNull || rawHost.isNull || rawHost === lit(""), lit(null).cast(StringType))
      .otherwise(concat(proto, lit("://"), host, portPart, path, queryPart))
  }

  /** The canonical host of a URL: lowercased, `www.` stripped, port
    * excluded; null for unparseable input.
    */
  def hostOf(url: Column): Column =
    regexp_replace(lower(try_parse_url(url, lit("HOST"))), "^www\\.", "")

  /** The registrable domain of a host under a static suffix list: the
    * label immediately left of the longest matching suffix, plus the
    * suffix ("a.b.example.co.uk" → "example.co.uk"). A host that IS a
    * bare suffix has no registrable part → null. Unknown suffixes fall
    * back to the last two labels (the public-suffix algorithm's `*`
    * default). One codegen'd when-chain — the list folds into literals.
    */
  def registrableDomain(host: Column,
                        suffixes: Seq[String] = DefaultSuffixes): Column = {
    val h = lower(host)
    val fallback = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    val ordered = suffixes.sortBy(s => -s.count(_ == '.'))
    val chain = ordered.foldLeft(Option.empty[Column]) { (acc, suffix) =>
      val quoted = suffix.replace(".", "\\.")
      val hit = h.endsWith("." + suffix)
      val reg = regexp_extract(h, "([^.]+\\." + quoted + ")$", 1)
      Some(acc match {
        case None => when(hit, reg)
        case Some(w) => w.when(hit, reg)
      })
    }
    val picked = chain.map(_.otherwise(
      when(fallback === lit(""), lit(null).cast(StringType)).otherwise(fallback)))
      .getOrElse(fallback)
    when(h.isNull || ordered.map(s => h === lit(s)).reduce(_ || _), lit(null).cast(StringType))
      .otherwise(picked)
  }
}
