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

  test("idempotence: canonicalizing a canonical URL is a no-op") {
    val df = spark.createDataFrame(cases.map(c => Tuple1(c._2))).toDF("u")
      .where(Urls.canonicalize(col("u")) =!= col("u"))
    assert(df.count() == 0L)
  }
}
