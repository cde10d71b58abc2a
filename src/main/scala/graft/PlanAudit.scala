package graft

/** Dump formatted physical plans for representative queries — the
  * "explain and iterate" loop. Usage: PlanAudit [queryName ...]
  *
  * Caveat: EAGER ops (bm25TopTerms — anything wrapped in Iterate.scoped)
  * execute at build time, so their printed plan is the post-checkpoint
  * scan, not the pipeline that ran. Audit those by reading the op's
  * construction (and this tool's plan for the stages downstream of the
  * checkpoint). ingestDocs/viafUpdate are lazy as of round 8 and audit
  * normally.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-plan-audit", "8")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_filter_project", "q6_join_chain", "q11_topk", "q22_range_join",
        "fast_docs", "dedup_minhash_pairs")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
