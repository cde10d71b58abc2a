package graft

import org.apache.spark.sql.functions._

import graft.ops.Urls

/** Table-driven canonicalization rules — each case isolates one rule of
  * the canonical form documented on [[graft.ops.Urls]].
  */
class UrlsSpec extends SparkSpec {

  private val cases: Seq[(String, String, String)] = Seq(
    // raw, expected canonical, expected registered domain
    ("https://example.com", "https://example.com/", "example.com"),
    ("HTTPS://EXAMPLE.COM/", "https://example.com/", "example.com"),
    ("https://www.example.com/a/", "https://example.com/a", "example.com"),
    ("https://WWW.example.com:443/a", "https://example.com/a", "example.com"),
    ("http://example.com:80/a", "http://example.com/a", "example.com"),
    ("http://example.com:8080/a", "http://example.com:8080/a", "example.com"),
    // m. is a real subdomain, kept; registered domain is the last 2 labels
    ("https://m.news.example.org/x", "https://m.news.example.org/x", "example.org"),
    ("https://example.com/a#frag", "https://example.com/a", "example.com"),
    ("https://example.com/a?utm_source=x", "https://example.com/a", "example.com"),
    ("https://example.com/a?utm_source=x&id=1", "https://example.com/a?id=1", "example.com"),
    ("https://example.com/a?id=1&utm_campaign=c&b=2", "https://example.com/a?id=1&b=2", "example.com"),
    ("https://example.com/a///", "https://example.com/a", "example.com"),
    ("https://example.com/?id=1#f", "https://example.com/?id=1", "example.com"))

  test("canonicalization rules, one case per rule") {
    val df = spark.createDataFrame(cases.zipWithIndex.map {
        case ((raw, _, _), i) => (i, raw)
      }).toDF("i", "raw")
      .select(col("i"), Urls.canonicalize(col("raw")).as("canon"),
        Urls.registeredDomain(col("raw")).as("dom"))
      .orderBy("i").collect()
    cases.zipWithIndex.foreach { case ((raw, canon, dom), i) =>
      assert(df(i).getString(1) == canon, s"canon of $raw")
      assert(df(i).getString(2) == dom, s"domain of $raw")
    }
  }

  test("differential property: column form equals an independent Scala reference on seeded random URLs") {
    // reference canonicalizer: direct string surgery, no regexes — an
    // implementation-independent cross-check of the column's regex logic
    def reference(u: String): String = {
      val schemeEnd = u.indexOf("://")
      val scheme = u.substring(0, schemeEnd).toLowerCase
      val rest = u.substring(schemeEnd + 3)
      val authEnd = rest.indexWhere(c => c == '/' || c == '?' || c == '#') match {
        case -1 => rest.length
        case i => i
      }
      val auth = rest.substring(0, authEnd)
      val afterAuth = rest.substring(authEnd)
      val (hostRaw, port) = auth.indexOf(':') match {
        case -1 => (auth, "")
        case i => (auth.substring(0, i), auth.substring(i + 1))
      }
      val host = {
        val h = hostRaw.toLowerCase
        if (h.startsWith("www.")) h.substring(4) else h
      }
      val keepPort = port.nonEmpty &&
        !(scheme == "https" && port == "443") && !(scheme == "http" && port == "80")
      val noFrag = afterAuth.indexOf('#') match {
        case -1 => afterAuth
        case i => afterAuth.substring(0, i)
      }
      val (pathRaw, query) = noFrag.indexOf('?') match {
        case -1 => (noFrag, "")
        case i => (noFrag.substring(0, i), noFrag.substring(i + 1))
      }
      val trimmed = pathRaw.reverse.dropWhile(_ == '/').reverse
      val path = if (trimmed.isEmpty) "/" else trimmed
      val kept = query.split("&", -1).filterNot(_.startsWith("utm_"))
        .mkString("&")
      scheme + "://" + host + (if (keepPort) ":" + port else "") + path +
        (if (kept.isEmpty) "" else "?" + kept)
    }
    val rnd = new scala.util.Random(20260813L)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    val urls = (1 to 500).map { _ =>
      pick(Seq("http://", "https://", "HTTP://", "HtTpS://")) +
        pick(Seq("", "www.", "WWW.", "m.", "api.")) +
        pick(Seq("example", "Test", "a-b", "x9")) +
        pick(Seq(".com", ".ORG", ".co.uk")) +
        pick(Seq("", ":80", ":443", ":8080", ":9")) +
        pick(Seq("", "/", "/a", "/a/b", "/a//", "/a/b///")) +
        pick(Seq("", "?id=1", "?utm_s=1", "?utm_s=1&id=2", "?a=1&utm_x=2&b=3", "?x=")) +
        pick(Seq("", "#f", "#a/b?c"))
    }
    import spark.implicits._
    val got = urls.toDF("u").select(graft.ops.Urls.canonicalize(col("u")).as("c"))
      .collect().map(_.getString(0))
    urls.zip(got).foreach { case (u, g) =>
      assert(g == reference(u), s"mismatch for $u: column=$g ref=${reference(u)}")
    }
  }

  test("idempotence: canonicalizing a canonical URL is a no-op") {
    val df = spark.createDataFrame(cases.map(c => Tuple1(c._2))).toDF("u")
      .where(Urls.canonicalize(col("u")) =!= col("u"))
    assert(df.count() == 0L)
  }

  test("resolveRelative: the RFC 3986-lite reference-resolution laws") {
    import graft.ops.Urls.resolveRelative
    val base = "http://www.Ex.com/a/b/page.html?q=1#frag"
    assert(resolveRelative(base, "http://other.com/x") === Some("http://other.com/x"))
    assert(resolveRelative(base, "HTTPS://caps.com/x") === Some("HTTPS://caps.com/x"))
    assert(resolveRelative(base, "//cdn.com/lib.js") === Some("http://cdn.com/lib.js"))
    assert(resolveRelative(base, "/root.html") === Some("http://www.Ex.com/root.html"))
    assert(resolveRelative(base, "sib.html") === Some("http://www.Ex.com/a/b/sib.html"))
    assert(resolveRelative(base, "../up.html") === Some("http://www.Ex.com/a/up.html"))
    assert(resolveRelative(base, "../../../clamp.html") ===
      Some("http://www.Ex.com/clamp.html"), ".. clamps at the root")
    assert(resolveRelative(base, "./same.html") === Some("http://www.Ex.com/a/b/same.html"))
    assert(resolveRelative(base, "d/") === Some("http://www.Ex.com/a/b/d/"),
      "trailing slash survives normalization")
    assert(resolveRelative(base, "x.html?k=v") ===
      Some("http://www.Ex.com/a/b/x.html?k=v"), "query rides the target")
    assert(resolveRelative(base, "?only=q") ===
      Some("http://www.Ex.com/a/b/page.html?only=q"))
    assert(resolveRelative(base, "x.html#sec") ===
      Some("http://www.Ex.com/a/b/x.html"), "fragment dropped")
    assert(resolveRelative(base, "#sec").isEmpty, "same-document link")
    assert(resolveRelative(base, "").isEmpty)
    assert(resolveRelative(base, "mailto:a@b.c").isEmpty)
    assert(resolveRelative(base, "javascript:void(0)").isEmpty)
    assert(resolveRelative(base, "data:text/plain,x").isEmpty)
    assert(resolveRelative("http://host", "p.html") === Some("http://host/p.html"),
      "authority-only base acts as /")
    assert(resolveRelative("ftp://host/a", "x").isEmpty, "non-http base")
    assert(resolveRelative(null, "x").isEmpty)
    assert(resolveRelative("http://h/", null).isEmpty)
  }
}
