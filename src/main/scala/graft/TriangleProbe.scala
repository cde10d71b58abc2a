package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Graph}

/** Settle VERDICT r11 #2 with evidence: race the self-join wedge build
  * against the per-pivot neighbor-list build (commit ffe435d, reverted in
  * 55c12f2 on an sf0.1-only measurement) on the GraphSmoke hash-wired
  * skewed graph at 1× and 10× edges. Each variant runs twice per size
  * (second time reported — plan/codegen warm); counts must agree.
  *
  * Usage: TriangleProbe [nodes] [degree] [scaleFactor]
  */
object TriangleProbe {
  def main(args: Array[String]): Unit = {
    val n0 = if (args.length > 0) args(0).toInt else 200000
    val deg = if (args.length > 1) args(1).toInt else 8
    val scale = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local("graft-triangle-probe")
    def edges(n: Int) = spark.range(n.toLong).toDF("src")
      .select(col("src"), explode(sequence(lit(0), lit(deg - 1))).as("j"))
      .select(col("src"),
        pmod(Dedup.md5Int(concat(col("src"), lit(":"), col("j"))),
          col("src") + lit(1)).as("dst"))
      .where(col("src") =!= col("dst"))
    for (n <- Seq(n0, n0 * scale)) {
      val e = edges(n)
      val res = Seq(false, true).map { nl =>
        var tri = 0L
        var best = Double.MaxValue
        (1 to 2).foreach { _ =>
          val t0 = System.nanoTime()
          tri = Graph.triangleCountImpl(e, "src", "dst", neighborListWedges = Some(nl))
            .collect().head.getLong(2)
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
          GraftSession.releaseAll(spark)
        }
        (nl, tri, best)
      }
      val (selfTri, selfSec) = (res(0)._2, res(0)._3)
      val (listTri, listSec) = (res(1)._2, res(1)._3)
      assert(selfTri == listTri, s"variant disagreement: $selfTri vs $listTri")
      println(f"TRIANGLE_PROBE nodes=$n triangles=$selfTri " +
        f"selfJoinSecs=$selfSec%.2f neighborListSecs=$listSec%.2f")
    }
    spark.stop()
  }
}
