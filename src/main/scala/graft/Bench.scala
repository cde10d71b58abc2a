package graft

/** Benchmark main: runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`, forcing full materialization through the `noop`
  * sink (count() alone would let Catalyst prune the projections away), and
  * prints one JSON line for the driver.
  *
  * Robustness against host-steal (this sandbox shows ±3× wall-clock noise
  * in multi-minute windows — NOTES.md):
  *  - three passes per query, min over passes 2–3 reported: pass 1 pays
  *    plan compilation + codegen JIT (measured at 5–7 s on the heavy
  *    queries — r5's apparent sketch regressions were exactly this rep-1
  *    cost landing in the record) and is never counted;
  *  - a fixed-work control job (`max(hash(id))` over a constant range) is
  *    timed after every query and the per-query control series is emitted
  *    in the JSON as a SPARSE map (`"ctl"`: sorted-query-order index →
  *    integer DECIseconds, only entries ≥ 2 ds; an absent index means the
  *    control ran ≤ 0.15 s there, i.e. the window was clean) — an
  *    elevated entry means the host was stolen during that query's
  *    window, so any apparent regression there is machine-attributable
  *    to the host, not the plan. Sparse because a clean run's series is
  *    all-zero: the dense 121-entry array cost ~260 bytes of the ~3 KB
  *    tail budget to say "nothing happened".
  *
  * Values are rounded (queries 10 ms, controls 100 ms) so the line stays
  * inside the driver's ~3 KB output-tail capture window (full-precision
  * doubles once pushed the line past it and the driver recorded
  * `parsed: null`).
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
      // pass 1 pays codegen JIT — steady state is min over passes 2–3
      (name, times.drop(1).min, control())
    }
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON.
    def ms(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def cs(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val ctlMin = results.map(_._3).min
    val ctlMax = results.map(_._3).max
    // The driver captures only the last ~3KB of output; with 129 queries
    // the line must stay under that (r3 and r4 both tripped this). Queries
    // at 10ms resolution; the per-query control series rides as a SPARSE
    // index→decisecond map (absent = clean window, ≤0.15s) so every entry
    // stays steal-attributable without the dense array's ~260-byte cost.
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + cs(v) }
      .mkString("{", ",", "}")
    results.collect { case (k, _, c) if c > 2 * ctlMin =>
      System.err.println(s"[bench] steal $k control=${ms(c)}") }
    System.err.println(f"[bench] control min=${ctlMin}%.2f max=${ctlMax}%.2f")
    val ctl = results.zipWithIndex
      .map { case ((_, _, c), i) => (i, math.round(c * 10)) }
      .collect { case (i, ds) if ds >= 2 => "\"" + i + "\":" + ds }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,""" +
      s""""ctl":$ctl,"sf":"$sfDir"}"""
    System.err.println(s"[bench] json line length: ${line.length}")
    println(line)
    spark.stop()
  }
}
