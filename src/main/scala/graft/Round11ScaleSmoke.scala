package graft

import org.apache.spark.sql.functions._

/** Round-11 scale smokes (VERDICT r10 item 6): drive the two bounded-blowup
  * claims at 1×/4×/10× the sf0.1 working set and print measured lines for
  * NOTES.md.
  *
  *  1. CC hybrid endgame: connected components over k id-shifted copies of
  *     the customer–supplier graph (~0.6M edges per copy at sf0.1, so
  *     k = 4 starts ABOVE the 2M-edge local-solve bound and k = 1 below
  *     it) — proves the single-task union-find switch fires exactly when
  *     the contracted edge count crosses the bound (run with
  *     GRAFT_CC_DEBUG=1 to see the per-cut edge counts) and that wall
  *     clock stays near-linear in k.
  *  2. ngram dfCap: `Dedup.ngramCandidates` over k exact copies of the
  *     documents corpus — the adversarial boilerplate case the cap
  *     exists for: every shingle's df multiplies by k, posting lists are
  *     clamped at dfCap, so candidate work per shingle is bounded by
  *     C(dfCap, 2) regardless of k and runtime must grow ~linearly with
  *     corpus size, never quadratically.
  *
  * Usage: Round11ScaleSmoke [sfDir] [cc|ngram|all]
  */
object Round11ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1) else "all"
    val spark = GraftSession.local("graft-scale11")

    val li = Tables.load(spark, sfDir, "lineitem").where(col("l_linenumber") === 1)
      .select("l_orderkey", "l_suppkey")
    val o = Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_custkey")
    val base = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("a"), (col("l_suppkey") + lit(1000000L)).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val baseEdges = base.count()
    // k = 30 puts the FIRST contracted round (~2.5M edges) above the 2M
    // local-solve bound, so the smoke exercises both sides of the switch:
    // k ≤ 10 goes local after cut 0, k = 30 stays distributed one more
    // round first (visible in the GRAFT_CC_DEBUG cut lines).
    for (k <- Seq(1, 4, 10, 30) if which == "all" || which == "cc") {
      val edges = (0 until k).map { c =>
        base.select((col("a") + lit(c * 100000000L)).as("a"),
          (col("b") + lit(c * 100000000L)).as("b"))
      }.reduce(_ unionAll _)
      val t0 = System.nanoTime()
      val cc = graft.ops.Dedup.connectedComponents(edges, "a", "b")
      val comps = cc.select(col("cluster_id")).distinct().count()
      val secs = (System.nanoTime() - t0) / 1e9
      graft.ops.Iterate.releaseCheckpoint(cc)
      println(f"CC_SCALE k=$k rawEdgesPerCopy=$baseEdges components=$comps secs=$secs%.2f")
      GraftSession.releaseAll(spark)
    }
    base.unpersist()

    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    for (k <- Seq(1, 3, 10) if which == "all" || which == "ngram") {
      val corpus = (0 until k).map { c =>
        docs.select((col("doc_id") + lit(c * 100000000L)).as("doc_id"), col("text"))
      }.reduce(_ unionAll _)
      val t0 = System.nanoTime()
      val n = graft.ops.Dedup.ngramCandidates(corpus, "text", "doc_id",
        k = 3, dfCap = 100, threshold = 0.5).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"NGRAM_SCALE k=$k pairs=$n secs=$secs%.2f")
      GraftSession.releaseAll(spark)
    }
    docs.unpersist()
    spark.stop()
  }
}
