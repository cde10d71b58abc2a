package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Scale smoke for the prefix-filter similarity join: N id-shifted copies
  * of the documents corpus — every document has N-1 exact near-dups, so
  * every true pair must survive the prefix filter (losslessness under
  * dense duplication), while the rare-first prefix keeps the candidate
  * join from going quadratic in the corpus. Prints one summary line
  * comparing candidate-stage pressure vs verified output; results
  * recorded in NOTES.md.
  *
  * Usage: PPJoinSmoke [sfDir] [copies]
  */
object PPJoinSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 10
    val spark = GraftSession.local("graft-ppjoin-smoke")
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val corpus = (0 until copies).map { c =>
      docs.withColumn("doc_id", col("doc_id") + lit(c * 1000000L))
    }.reduce(_ unionByName _)

    val t0 = System.nanoTime()
    val nDocs = corpus.count()
    val pairs = Dedup.prefixJaccardJoin(corpus, "text", "doc_id")
    val stats = pairs
      .agg(count(lit(1)).as("n_pairs"), min("sim_bp").as("min_bp"))
      .collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    val nPairs = stats.getAs[Long]("n_pairs")
    // every doc pairs with its N-1 copies: N*(N-1)/2 per original doc is
    // the exact-duplicate floor the result must contain
    val floor = (nDocs / copies) * (copies.toLong * (copies - 1) / 2)
    println(f"PPJOIN_SMOKE copies=$copies docs=$nDocs pairs=$nPairs " +
      f"exactDupFloor=$floor minSimBp=${stats.getAs[Long]("min_bp")} " +
      f"secs=$secs%.1f docsPerSec=${nDocs / secs}%.0f")
    spark.stop()
  }
}
