package graft

import org.apache.spark.sql.functions._

import graft.ops.Quality

/** Scale smoke for the corpus-quality family: N id-shifted copies of the
  * documents corpus through duplicate-n-gram fraction — the worst load
  * for the shingle-key document-frequency join (every shingle's df
  * multiplies by N) — plus the LM scorer. Checks the structural
  * invariant copies imply: every doc in a copied corpus shares ALL its
  * n-grams with its twins, so dup_frac_bp must be exactly 10000 for
  * every doc with grams (keep = 0 across the board).
  *
  * Usage: QualitySmoke [sfDir] [copies]
  */
object QualitySmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 20
    val spark = GraftSession.local("graft-quality-smoke")
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val corpus = (0 until copies).map { c =>
      docs.withColumn("doc_id", col("doc_id") + lit(c * 1000000L))
    }.reduce(_ unionByName _)

    val t0 = System.nanoTime()
    val nDocs = corpus.count()
    val frac = Quality.dupGramFraction(corpus, "text", "doc_id")
    val bad = frac.where(col("n_grams") > 0 && col("dup_frac_bp") =!= 10000).count()
    val total = frac.count()
    val t1 = System.nanoTime()
    // LM scoring over the same corpus (broadcast global freqs, sorted fold)
    val toks = corpus.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .where(col("term") =!= "")
    val scored = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      .join(broadcast(toks.groupBy("term").agg(count(lit(1)).as("gf"))), "term")
      .groupBy("doc_id").agg(sum("c").as("n_tok"))
      .count()
    val t2 = System.nanoTime()
    println(f"QUALITY_SMOKE copies=$copies docs=$nDocs dupfracRows=$total " +
      f"fullDupViolations=$bad dupfracSecs=${(t1 - t0) / 1e9}%.1f " +
      f"lmScoredDocs=$scored lmSecs=${(t2 - t1) / 1e9}%.1f")
    spark.stop()
  }
}
