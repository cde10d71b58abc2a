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
