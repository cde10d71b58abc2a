package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale smoke for the custom top-k operator: 20M rows / 2k groups,
  * top-5 per group — exec (map-side pruned shuffle) vs the window
  * row_number form (full shuffle + per-group sort). Prints wall seconds
  * and asserts identical results.
  */
object TopKExecSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("topk-smoke", "16")
    val n = 20000000L
    val df = spark.range(n).select(
        (col("id") % 2000).as("g"),
        (pmod(col("id") * 2654435761L, lit(1000000000L))).as("v"),
        col("id"))
      .repartition(32)
    df.persist(); df.count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"$label%-8s ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
    }
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    time("window") {
      df.withColumn("rn", row_number().over(w)).where(col("rn") <= 5).count()
    }
    time("exec") {
      graft.ops.TopK.topKPerGroupExec(df, Seq("g"), Seq(("v", true), ("id", false)), 5).count()
    }
    val a = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = graft.ops.TopK.topKPerGroupExec(df, Seq("g"), Seq(("v", true), ("id", false)), 5)
      .select("id").collect().map(_.getLong(0)).toSet
    println(s"EQUAL=${a == b} (${a.size} rows)")
    spark.stop()
  }
}
