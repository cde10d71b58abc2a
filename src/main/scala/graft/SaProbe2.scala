package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Fine-grained bisect of the seed rankRound cost (round-14 diagnosis). */
object SaProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-sa-probe2")
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    docs.count()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      System.err.println(f"[probe] $tag ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    val seedLen = 128
    val sfx = docs
      .select(col("doc_id").as("_id"), split(col("text"), " ").as("_ws"))
      .select(col("_id"), col("_ws"),
        explode(expr("sequence(0, size(_ws) - 1)")).as("_p"))
      .select(col("_id"), col("_p").cast("long").as("pos"),
        array_join(expr(s"slice(_ws, _p + 1, $seedLen)"), " ").as("_p0"),
        (size(col("_ws")).cast("long") - col("_p")).as("_rem"))
    time("sfx.count")(sfx.count())
    time("sfx.count2")(sfx.count())
    val keys = Seq(col("_p0"), col("_id"), col("pos"))
    time("rbr.write")(sfx.repartitionByRange(32, keys: _*)
      .write.format("noop").mode("overwrite").save())
    val ranged = sfx.repartitionByRange(32, keys: _*)
      .withColumn("_pid", spark_partition_id())
    var m: graft.ops.Iterate.Materialized = null
    time("rbr.ckpt") { m = graft.ops.Iterate.materialize(ranged) }
    time("ckpt.count")(m.df.count())
    val w = Window.partitionBy("_pid").orderBy(keys: _*)
    time("window.noop")(m.df.withColumn("_local", row_number().over(w))
      .write.format("noop").mode("overwrite").save())
    val grp = m.df.groupBy("_p0").agg(count(lit(1)).as("_n"))
    time("grp.noop")(grp.write.format("noop").mode("overwrite").save())
    val rn = m.df.withColumn("_local", row_number().over(w))
    time("join.noop")(rn.join(grp, Seq("_p0"))
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
