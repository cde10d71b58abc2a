package graft

import org.apache.spark.sql.functions._

/** Timing probe for the suffix-array build stages (round count, LCP join). */
object SaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    // optional seed override: AdaptiveSeed (-1) by default
    val seed = if (args.length > 1) args(1).toInt else graft.ops.SuffixArray.AdaptiveSeed
    val spark = GraftSession.local("graft-sa-probe")
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val warm = docs.count() // isolate scan/codegen warmup from the build
    val t0 = System.nanoTime()
    val sa = graft.ops.SuffixArray.build(docs, "text", "doc_id", startPrefix = seed)
    val t1 = System.nanoTime()
    val n = sa.count()
    val t2 = System.nanoTime()
    val lcp = graft.ops.SuffixArray.lcpNeighbors(docs, "text", "doc_id", sa)
    val mx = lcp.agg(max("lcp")).collect().head.getLong(0)
    val t3 = System.nanoTime()
    println(f"SA_PROBE n=$n maxLcp=$mx buildSecs=${(t1 - t0) / 1e9}%.2f " +
      f"countSecs=${(t2 - t1) / 1e9}%.2f lcpSecs=${(t3 - t2) / 1e9}%.2f warm=$warm")
    spark.stop()
  }
}
