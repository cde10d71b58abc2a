package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Scale smoke for exact-substring span dedup: N id-shifted copies of the
  * documents corpus — every document's every 5-token span duplicated N
  * times, the worst realistic load for the gram winner aggregate (each
  * gram key carries N× occurrences) and the covered-position explode
  * (all copies but one lose everything). Checks the keep-first invariant
  * at scale: total kept tokens must equal ONE corpus copy's kept tokens
  * (the first copy survives, every shifted copy dissolves), and no
  * kept-token count may exceed its doc's token count.
  *
  * Usage: SpansSmoke [sfDir] [copies]
  */
object SpansSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 20
    val spark = GraftSession.local("graft-spans-smoke")
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val corpus = (0 until copies).map { c =>
      docs.withColumn("doc_id", col("doc_id") + lit(c * 1000000L))
    }.reduce(_ unionByName _)

    // single-copy baseline: within-corpus duplication only. Docs shorter
    // than k tokens carry no grams, so every copy keeps them whole — the
    // exact expectation is base + (copies-1) × their token mass.
    val base = Dedup.dedupSpans(docs, "text", "doc_id", k = 5)
      .agg(sum("n_kept").as("kept")).collect().head.getLong(0)
    val shortToks = docs.where(size(split(col("text"), " ")) < 5)
      .agg(coalesce(sum(size(split(col("text"), " "))), lit(0)).cast("long"))
      .collect().head.getLong(0)
    val expectKept = base + (copies - 1).toLong * shortToks

    val t0 = System.nanoTime()
    val out = Dedup.dedupSpans(corpus, "text", "doc_id", k = 5)
    val stats = out.agg(count(lit(1)).as("n_docs"), sum("n_tok").as("toks"),
        sum("n_kept").as("kept"),
        sum(when(col("n_kept") > col("n_tok"), 1).otherwise(0)).as("viol"))
      .collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    val toks = stats.getAs[Long]("toks")
    println(f"SPANS_SMOKE copies=$copies docs=${stats.getAs[Long]("n_docs")} " +
      f"toks=$toks keptBase=$base kept=${stats.getAs[Long]("kept")} " +
      f"keepFirstHolds=${stats.getAs[Long]("kept") == expectKept} " +
      f"viol=${stats.getAs[Long]("viol")} secs=$secs%.1f " +
      f"toksPerSec=${toks / secs}%.0f")
    spark.stop()
  }
}
