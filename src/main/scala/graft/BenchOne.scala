package graft

/** Run one named query N times in a single session — separates plan/codegen
  * warm-up from steady-state. Usage: BenchOne <name> [reps] [sfDir]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = GraftSession.local("graft-bench-one")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      GraftSession.releaseAll(spark)
      // Bench's own fixed-work control: normalizes host-steal windows and
      // stays comparable if the control workload is ever re-tuned there
      val ctl = Bench.control(spark)
      println(f"RUN$i=$dt%.2f CTL=$ctl%.2f")
    }
    spark.stop()
  }
}
