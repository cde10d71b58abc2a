package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Scale smoke for the near-dup pipeline: N id-shifted copies of the
  * documents corpus (every doc duplicated N times → dense duplicate
  * clusters, the worst realistic load for LSH banding and component
  * contraction), through minhash → LSH candidates → connected components.
  * Prints one summary line; results recorded in NOTES.md.
  *
  * Usage: DedupSmoke [sfDir] [copies]
  */
object DedupSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 20
    val spark = GraftSession.local("graft-dedup-smoke")
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val corpus = (0 until copies).map { c =>
      docs.withColumn("doc_id", col("doc_id") + lit(c * 1000000L))
    }.reduce(_ unionByName _)

    val t0 = System.nanoTime()
    val nDocs = corpus.count()
    val pairs = Dedup.minhashCandidates(
      Dedup.minhashSignature(corpus, "text", "doc_id"), "doc_id")
    val clusters = Dedup.connectedComponents(pairs, "a_id", "b_id")
    val stats = clusters.groupBy("cluster_id").agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_clusters"), max("sz").as("max_sz"),
        sum("sz").as("n_clustered"))
      .collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"DEDUP_SMOKE copies=$copies docs=$nDocs " +
      f"clusters=${stats.getAs[Long]("n_clusters")} maxSize=${stats.getAs[Long]("max_sz")} " +
      f"clustered=${stats.getAs[Long]("n_clustered")} secs=$secs%.1f " +
      f"docsPerSec=${nDocs / secs}%.0f")
    spark.stop()
  }
}
