package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the key for
  * dedup-by-URL (the first-line dedup of every web-scale pretraining
  * pipeline, ahead of any content hashing) and for per-domain rollups /
  * blocklists. Pure built-in string/regex expressions over the
  * `scheme://host[:port][/path][?query][#fragment]` shape — everything
  * stays inside whole-stage codegen, no UDFs, and the same regexes run
  * in the DuckDB oracle.
  *
  * Canonical form: lowercase scheme and host, leading `www.` stripped
  * (other subdomains like `m.` are real hosts and kept), default ports
  * dropped (`:443` for https, `:80` for http; others kept), `utm_*`
  * tracking parameters removed with remaining params kept in original
  * order, trailing path slashes trimmed (bare host → `/`), fragment
  * dropped.
  *
  * Input contract: absolute URLs with an explicit `scheme://` — the
  * canonical web-corpus case (crawl records carry absolute URLs).
  * Strings without `://` fall through the regexes as empty components;
  * filter or repair relative references upstream.
  */
object Urls {

  def scheme(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host with any leading `www.` removed. */
  def host(u: Column): Column =
    regexp_replace(lower(regexp_extract(u, "^[^:/?#]+://([^/?#:]+)", 1)),
      "^www\\.", "")

  /** Explicit port digits, or empty when the URL carries none. */
  def port(u: Column): Column =
    regexp_extract(u, "^[^:/?#]+://[^/?#:]+:([0-9]+)", 1)

  def path(u: Column): Column =
    regexp_extract(u, "^[^:/?#]+://[^/?#]+([^?#]*)", 1)

  /** Query text between the first `?` BEFORE any `#` and the fragment —
    * a `?` inside the fragment is fragment content, not a query (caught
    * by the differential property test in UrlsSpec).
    */
  def query(u: Column): Column = regexp_extract(u, "^[^#?]*\\?([^#]*)", 1)

  /** Registered domain = last two dot-labels of the canonical host (a
    * public-suffix list refines this at deploy; the two-label rule is the
    * standard fallback and what the fixtures exercise).
    */
  def registeredDomain(u: Column): Column =
    regexp_extract(host(u), "([^.]+\\.[^.]+)$", 1)

  /** RFC 3986-lite reference resolution for link harvesting
    * ([[Html.extractLinks]] → the crawl frontier): absolute URLs pass
    * through, protocol-relative take the base scheme, path-absolute take
    * the base authority, plain-relative resolve against the base
    * DIRECTORY with `.`/`..` segment normalization (`..` at the root
    * clamps, per the RFC's remove_dot_segments). Fragment-only and
    * non-fetchable schemes (`mailto:`, `javascript:`, `data:`, …)
    * return None — a frontier must not enqueue them. Pure function +
    * [[resolveUrl]] Column form.
    */
  def resolveRelative(base: String, href0: String): Option[String] = {
    if (base == null || href0 == null) return None
    val href = href0.trim
    val schemeRx = "^([A-Za-z][A-Za-z0-9+.-]*):".r
    def isHttp(s: String) = s.equalsIgnoreCase("http") || s.equalsIgnoreCase("https")
    def normalize(p: String): String = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      for (seg <- p.split("/", -1)) seg match {
        case "." =>
        case ".." => if (out.nonEmpty) out.remove(out.length - 1)
        case s => out += s
      }
      val joined = out.mkString("/")
      val trail = if (p.endsWith("/..") || p.endsWith("/.") || p.endsWith("/")) "/" else ""
      val body = if (joined.startsWith("/")) joined else "/" + joined
      if (body == "/") "/" else body.stripSuffix("/") + trail match {
        case "" => "/"
        case x => x
      }
    }
    val baseScheme = schemeRx.findFirstMatchIn(base).map(_.group(1)).getOrElse("")
    val authority = // scheme://host[:port]
      base.replaceAll("^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+).*$", "$1")
    val basePath = {
      val p = base.replaceAll("^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+", "")
        .takeWhile(c => c != '?' && c != '#')
      if (p.isEmpty) "/" else p
    }
    schemeRx.findFirstMatchIn(href) match {
      case Some(m) => if (isHttp(m.group(1))) Some(href) else None
      case None =>
        if (!isHttp(baseScheme) || !authority.contains("://")) None
        else if (href.isEmpty || href.startsWith("#")) None // same document
        else if (href.startsWith("//")) Some(s"$baseScheme:$href")
        else if (href.startsWith("/")) Some(authority + normalize(href))
        else if (href.startsWith("?")) Some(authority + basePath + href)
        else {
          val dir = basePath.substring(0, basePath.lastIndexOf('/') + 1)
          // keep any query on the relative target, normalize only the path
          val cut = href.indexWhere(c => c == '?' || c == '#')
          val (pathPart, rest0) =
            if (cut < 0) (href, "") else (href.take(cut), href.drop(cut))
          val rest = if (rest0.startsWith("#")) "" else rest0
          Some(authority + normalize(dir + pathPart) + rest)
        }
    }
  }

  private val resolveUdf = udf((b: String, h: String) =>
    resolveRelative(b, h).orNull)

  /** Column form of [[resolveRelative]] (null = not fetchable). */
  def resolveUrl(base: Column, href: Column): Column = resolveUdf(base, href)

  /** The canonical URL string (see object doc for the exact rules). */
  def canonicalize(u: Column): Column = {
    val sch = scheme(u)
    val hst = host(u)
    val prt = port(u)
    val keepPort = prt =!= "" &&
      !(sch === "https" && prt === "443") && !(sch === "http" && prt === "80")
    val trimmed = regexp_replace(path(u), "/+$", "")
    val pth = when(trimmed === "", lit("/")).otherwise(trimmed)
    val qKept = array_join(
      filter(split(query(u), "&"), p => !p.startsWith("utm_")), "&")
    concat(sch, lit("://"), hst,
      when(keepPort, concat(lit(":"), prt)).otherwise(lit("")),
      pth,
      when(qKept === "", lit("")).otherwise(concat(lit("?"), qKept)))
  }
}
