package graft

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`, forcing full materialization through the `noop`
  * sink (count() alone would let Catalyst prune the projections away), and
  * prints one JSON line for the driver.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local("graft-bench", cpus)
    // One warm-up action so JVM/codegen startup cost isn't billed to q1.
    SparkEntry.queries.get("q1_filter_project")
      .foreach(fn => fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    // Two timed passes per query, min reported: the first pass pays plan
    // compilation + codegen JIT (and any host-steal blip); the min is the
    // steady-state cost a long-running cluster job actually sees.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        // drop per-query persisted data so later queries aren't taxed by
        // earlier queries' cache (GC pressure dominates variance otherwise)
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
