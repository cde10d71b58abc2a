package graft

import org.apache.spark.sql.functions._

/** Round-14 probe: edge-derivation vs loop cost in graph_scc/graph_ppr. */
object SaProbe4 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-probe4")
    def t(name: String) = Tables.load(spark, dir, name)
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[p4] $tag ${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    (1 to 2).foreach { rep =>
      System.err.println(s"[p4] === rep $rep")
      val li = t("lineitem").select("l_orderkey", "l_suppkey")
      val o = t("orders").select("o_orderkey", "o_custkey")
      val c = t("customer").select("c_custkey", "c_nationkey")
      val su = t("supplier").select("s_suppkey", "s_nationkey")
      val e = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .where(col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
        .agg(count(lit(1)).as("cnt"))
        .where(col("cnt") % 11 === 0)
        .select("src", "dst")
      time("scc edge derivation count")(e.count())
      time("scc full")(
        graft.ops.Graph.stronglyConnectedComponents(e, "src", "dst")
          .orderBy("node").write.format("noop").mode("overwrite").save())
      val e2 = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(su, col("l_suppkey") === col("s_suppkey"))
        .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      val seeds = t("nation").where(col("n_nationkey") < 5)
        .select(col("n_nationkey"))
      time("ppr edge derivation count")(e2.count())
      time("ppr full")(
        graft.ops.Graph.personalizedPageRank(e2, "src", "dst",
            seeds, "n_nationkey", iterations = 3)
          .select(col("node"), round(col("rank") * lit(1e8)).cast("long").as("rank_e8"))
          .orderBy("node").write.format("noop").mode("overwrite").save())
      GraftSession.releaseAll(spark)
    }
    spark.stop()
  }
}
