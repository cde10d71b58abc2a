package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Graph}

/** Scale smoke for the graph family: a synthetic hash-wired graph (heavy
  * right-skew — node i links to md5-derived targets biased toward low
  * ids, so hubs exist) through triangle counting, label propagation, and
  * PageRank. Prints one summary line; results recorded in NOTES.md.
  *
  * Usage: GraphSmoke [nodes] [degree]
  */
object GraphSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 200000
    val deg = if (args.length > 1) args(1).toInt else 8
    val spark = GraftSession.local("graft-graph-smoke")
    // skewed targets: md5 % (i+1) biases edges toward low-id hubs
    val edges = spark.range(n.toLong).toDF("src")
      .select(col("src"), explode(sequence(lit(0), lit(deg - 1))).as("j"))
      .select(col("src"),
        pmod(Dedup.md5Int(concat(col("src"), lit(":"), col("j"))),
          col("src") + lit(1)).as("dst"))
      .where(col("src") =!= col("dst"))

    val t0 = System.nanoTime()
    val tri = Graph.triangleCount(edges, "src", "dst").collect().head
    val t1 = System.nanoTime()
    val nComms = Graph.labelPropagation(edges, "src", "dst", iterations = 5)
      .select(countDistinct(col("label"))).collect().head.getLong(0)
    val t2 = System.nanoTime()
    val rankSum = Graph.pageRank(edges, "src", "dst", iterations = 5)
      .agg(sum("rank")).collect().head.getDouble(0)
    val t3 = System.nanoTime()
    // BFS from node 0 (every node links toward low ids, so most of the
    // graph reaches 0's neighborhood quickly when symmetrized).
    // Structural invariant, checked exactly: every level-L node (L≥1)
    // has at least one in-edge from a level-(L−1) node, and NO in-edge
    // from any level < L−1 (else its level would be smaller).
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
    val lv = Graph.bfsLevels(sym, "src", "dst",
      spark.range(1).toDF("node"), "node", maxLevels = 8)
    val reached = lv.count()
    val parentEdges = sym.join(lv.withColumnsRenamed(
        Map("node" -> "src", "level" -> "src_level")), "src")
      .join(lv.withColumnsRenamed(Map("node" -> "dst", "level" -> "dst_level")), "dst")
    val levelViolations = parentEdges
      .groupBy("dst", "dst_level").agg(min("src_level").as("min_parent"))
      .where(col("dst_level") >= 1 && col("min_parent") =!= col("dst_level") - 1)
      .count()
    val t4 = System.nanoTime()
    println(f"GRAPH_SMOKE nodes=${tri.getLong(0)} edges=${tri.getLong(1)} " +
      f"triangles=${tri.getLong(2)} triSecs=${(t1 - t0) / 1e9}%.1f " +
      f"lpaComms=$nComms lpaSecs=${(t2 - t1) / 1e9}%.1f " +
      f"prMassError=${math.abs(rankSum - 1.0)}%.2e prSecs=${(t3 - t2) / 1e9}%.1f " +
      f"bfsReached=$reached bfsLevelViolations=$levelViolations " +
      f"bfsSecs=${(t4 - t3) / 1e9}%.1f")
    spark.stop()
  }
}
