package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Graph}

/** Scale smoke for the round-13 graph ops: SCC and Jaccard link
  * prediction on million-node synthetic graphs (results in NOTES.md).
  *
  * SCC fixture: `blocks` disjoint random digraphs of `m` nodes at
  * out-degree `deg` (deg > ln m ⇒ each block strongly connected whp, so
  * expected components = blocks, each of size m). No cross-block edges,
  * so the structural invariant `scc_id div m == node div m` holds for
  * EVERY node regardless of whether a block happens to split — that one
  * is hard-asserted; the component count/sizes are reported.
  *
  * Jaccard fixture: GraphSmoke's hash-wired skewed graph (low-id hubs),
  * exercising the hub-center degree guard and the cn >= 2 support
  * threshold at millions of candidate pairs.
  *
  * Usage: SccScaleSmoke [blocks] [m] [deg] [jacNodes] [jacDeg]
  */
object SccScaleSmoke {
  def main(args: Array[String]): Unit = {
    val blocks = if (args.length > 0) args(0).toInt else 1000
    val m = if (args.length > 1) args(1).toInt else 1000
    val deg = if (args.length > 2) args(2).toInt else 12
    val jacNodes = if (args.length > 3) args(3).toInt else 500000
    val jacDeg = if (args.length > 4) args(4).toInt else 8
    val spark = GraftSession.local("graft-scc-smoke")

    val n = blocks.toLong * m
    val sccEdges = spark.range(n).toDF("src")
      .select(col("src"), explode(sequence(lit(0), lit(deg - 1))).as("j"))
      .select(col("src"),
        (col("src") - pmod(col("src"), lit(m.toLong)) +
          pmod(Dedup.md5Int(concat(col("src"), lit(":"), col("j"))),
            lit(m.toLong))).as("dst"))
      .where(col("src") =!= col("dst"))
    val t0 = System.nanoTime()
    val scc = Graph.stronglyConnectedComponents(sccEdges, "src", "dst")
    val stats = scc.agg(count(lit(1)).as("n"),
        countDistinct("scc_id").as("comps"),
        sum(when(expr(s"scc_id div $m") =!= expr(s"node div $m"), 1L)
          .otherwise(0L)).as("cross_block"))
      .collect().head
    val sizes = scc.groupBy("scc_id").agg(count(lit(1)).as("sz"))
      .agg(min("sz").as("mn"), max("sz").as("mx")).collect().head
    val t1 = System.nanoTime()
    require(stats.getLong(2) == 0L,
      s"SCC crossed a block boundary: ${stats.getLong(2)} nodes")

    val jEdges = spark.range(jacNodes.toLong).toDF("src")
      .select(col("src"), explode(sequence(lit(0), lit(jacDeg - 1))).as("j"))
      .select(col("src"),
        pmod(Dedup.md5Int(concat(col("src"), lit(":"), col("j"))),
          col("src") + lit(1)).as("dst"))
      .where(col("src") =!= col("dst"))
    val t2 = System.nanoTime()
    val sim = Graph.neighborSimilarity(jEdges, "src", "dst",
      maxDegree = 128, minCn = 2)
    val simStats = sim.agg(count(lit(1)).as("pairs"),
        max("jaccard_bp").as("topJ"),
        sum(when(col("linked"), 1L).otherwise(0L)).as("linked"))
      .collect().head
    val t3 = System.nanoTime()

    println(f"SCC_SMOKE nodes=${stats.getLong(0)} comps=${stats.getLong(1)} " +
      f"(expect=$blocks) minSz=${sizes.getLong(0)} maxSz=${sizes.getLong(1)} " +
      f"sccSecs=${(t1 - t0) / 1e9}%.1f | jaccard pairs=${simStats.getLong(0)} " +
      f"topJ=${simStats.getLong(1)} linked=${simStats.getLong(2)} " +
      f"jacSecs=${(t3 - t2) / 1e9}%.1f")
    spark.stop()
  }
}
