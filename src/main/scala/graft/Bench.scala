package graft

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`, forcing full materialization through the `noop`
  * sink (count() alone would let Catalyst prune the projections away), and
  * prints one JSON line for the driver.
  *
  * Robustness against host-steal (this sandbox shows ±3× wall-clock noise
  * in multi-minute windows — NOTES.md):
  *  - three timed passes per query, min reported: pass 1 pays plan
  *    compilation + codegen JIT; the min is the steady-state cost a
  *    long-running cluster job actually sees, and three passes make it
  *    unlikely ALL of them land in a steal window;
  *  - a fixed-work control job (`max(hash(id))` over a constant range) is
  *    timed after every query; its min/max over the whole run are emitted,
  *    and queries whose adjacent control exceeded 2× the control minimum
  *    are listed in `"steal"` — a regression flagged there is the host,
  *    not the plan.
  *
  * Values are rounded to milliseconds so the line stays well inside the
  * driver's output-tail capture window (full-precision doubles once pushed
  * the line past it and the driver recorded `parsed: null`).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local("graft-bench", cpus)

    def control(): Double = {
      val t0 = System.nanoTime()
      spark.range(64L << 20).selectExpr("max(hash(id)) AS h")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // One warm-up action so JVM/codegen startup cost isn't billed to q1.
    SparkEntry.queries.get("q1_filter_project")
      .foreach(fn => fn(spark, sfDir).write.format("noop").mode("overwrite").save())
    control()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        // drop per-query persisted data so later queries aren't taxed by
        // earlier queries' cache (GC pressure dominates variance otherwise)
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      (name, times.min, control())
    }
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON.
    def ms(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def cs(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val ctlMin = results.map(_._3).min
    val ctlMax = results.map(_._3).max
    // The driver captures only the last ~3KB of output; with 80+ queries the
    // line must stay well under that (r3 and r4 both tripped this). Queries
    // at 10ms resolution, steal map capped at the 5 worst — the full
    // per-query control series goes to stderr instead.
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + cs(v) }
      .mkString("{", ",", "}")
    val stolen = results.collect { case (k, _, c) if c > 2 * ctlMin => (k, c) }
    stolen.foreach { case (k, c) => System.err.println(s"[bench] steal $k control=${ms(c)}") }
    val steal = stolen.sortBy(-_._2).take(5).map { case (k, c) => "\"" + k + "\":" + cs(c) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,""" +
      s""""control":{"min":${cs(ctlMin)},"max":${cs(ctlMax)}},"steal":$steal,"sf":"$sfDir"}"""
    System.err.println(s"[bench] json line length: ${line.length}")
    println(line)
    spark.stop()
  }
}
