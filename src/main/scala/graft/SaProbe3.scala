package graft

import org.apache.spark.sql.functions._

/** Stage-level timing of the dedupSpansSa pipeline (round-14 diagnosis). */
object SaProbe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-sa-probe3")
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    docs.count()
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    val k = 5
    (1 to 2).foreach { rep =>
      System.err.println(s"[probe] === rep $rep")
      val sa = time("build(refineTo=5)") {
        val s = graft.ops.SuffixArray.build(docs, "text", "doc_id", refineTo = k)
        s.write.format("noop").mode("overwrite").save(); s
      }
      val lcp = time("lcp(cap=5)") {
        val l = graft.ops.SuffixArray.lcpNeighbors(docs, "text", "doc_id", sa,
          cap = k, exact = false, emitPrefix = true)
        l.write.format("noop").mode("overwrite").save(); l
      }
      time("full dedupSpansSa") {
        graft.ops.Dedup.dedupSpansSa(docs, "text", "doc_id", k = k)
          .write.format("noop").mode("overwrite").save()
      }
      time("full dedupSpansExact") {
        graft.ops.Dedup.dedupSpansExact(docs, "text", "doc_id", k = k)
          .write.format("noop").mode("overwrite").save()
      }
      GraftSession.releaseAll(spark)
    }
    spark.stop()
  }
}
