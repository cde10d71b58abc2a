package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Normalize

/** SQL-function surface of the engine: registration of the custom scalar
  * functions plus Column-level helpers usable from the DataFrame API.
  */
object Functions {

  /** Register every custom scalar function on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("normalize_label", (s: String) => Normalize.normalize(s))
    spark.udf.register("singularize", (s: String) => Normalize.singularize(s))
    spark.udf.register("normalize_singular", (s: String) => Normalize.normalizeSingular(s))
    // native codegen expressions — usable from SQL / expr()
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => graft.functions.VecDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", exprs => graft.functions.WordShingles(
        exprs(0), exprs(1).eval().asInstanceOf[Int]), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "parse_nt", exprs => graft.functions.ParseNt(exprs(0)), "built-in")
  }

  /** `normalize_label` as a Column op — pure built-ins (codegen'd, no UDF):
    * lowercase → strip punctuation to spaces → collapse runs → trim.
    * Identical to [[Normalize.normalize]] for ASCII input; non-ASCII input
    * additionally needs accent folding, which built-ins can't express — use
    * [[normalizeLabel]] (UDF) when the corpus may carry diacritics.
    */
  def normalizeLabelAscii(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  private val normalizeUdf = udf((s: String) => Normalize.normalize(s))
  private val normalizeSingularUdf = udf((s: String) => Normalize.normalizeSingular(s))
  private val singularizeUdf = udf((s: String) => Normalize.singularize(s))

  def normalizeLabel(c: Column): Column = normalizeUdf(c)
  def normalizeSingular(c: Column): Column = normalizeSingularUdf(c)
  def singularize(c: Column): Column = singularizeUdf(c)
}
