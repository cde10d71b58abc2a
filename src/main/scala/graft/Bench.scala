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

    // A query that throws must NEVER be recorded as a (fast) timing: in
    // round 6 the event-window family failed mid-round and its near-zero
    // failure times landed in the record looking like sub-control "wins"
    // (ADVICE r6). Failed queries are excluded from timings/total and
    // reported explicitly in both the full record and the stdout line.
    val raw = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val passes = (1 to 3).map { i =>
        val t0 = System.nanoTime()
        val passOk =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name pass $i failed: $e")
            false
          }
        // drop per-query persisted data so later queries aren't taxed by
        // earlier queries' cache (GC pressure dominates variance otherwise)
        GraftSession.releaseAll(spark)
        ((System.nanoTime() - t0) / 1e9, passOk)
      }
      // pass 1 pays codegen JIT — steady state is min over the SUCCESSFUL
      // passes among 2–3. A transient pass-1-only failure (host steal, OOM
      // blip) must not drop a query whose steady-state passes produced
      // valid timings — but a query with no successful steady pass is
      // failed, never recorded as a (near-zero) timing (ADVICE r6).
      val steady = passes.drop(1).collect { case (t, true) => t }
      if (passes.exists(!_._2) && steady.nonEmpty)
        System.err.println(s"[bench] $name: partial failure, " +
          s"steady-state kept from ${steady.size} clean pass(es)")
      (name, if (steady.isEmpty) 0.0 else steady.min, control(), steady.nonEmpty)
    }
    val failedQs = raw.collect { case (name, _, _, false) => name }
    val results = raw.collect { case (name, t, c, true) => (name, t, c) }
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON.
    def ms(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // 10ms resolution with trailing zeros stripped ("0.20"→"0.2", "3.00"→"3").
    def cs(v: Double): String = java.math.BigDecimal.valueOf(v)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .stripTrailingZeros.toPlainString
    val ctlMin = results.map(_._3).min
    val ctlMax = results.map(_._3).max
    results.collect { case (k, _, c) if c > 2 * ctlMin =>
      System.err.println(s"[bench] steal $k control=${ms(c)}") }
    System.err.println(f"[bench] control min=${ctlMin}%.2f max=${ctlMax}%.2f")
    val total = results.map(_._2).sum
    // The driver keeps only the last ~2000 chars of output (measured:
    // every BENCH_r1..r5 record stores a 2000-char tail and parsed:null —
    // the full per-query map never fit). Two-tier record instead:
    //  - BENCH_FULL.json (repo root, committed per round): every query as
    //    [steady_sec, control_sec] at 3-dp — the complete, steal-
    //    attributable record;
    //  - the stdout line: total + the HEADLINE subset (reference-core
    //    dataflow + the heaviest operator families), sized ≤ ~1.8KB so the
    //    line survives the tail capture whole.
    val fullQs = results.map { case (k, v, c) => s""""$k":[${ms(v)},${ms(c)}]""" }
      .mkString("{", ",", "}")
    val failedJson = failedQs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullLine = s"""{"metric":"total","value":${ms(total)},"unit":"sec",""" +
      s""""n":${results.size},"failed":$failedJson,"queries_ctl":$fullQs,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_FULL.json"), fullLine)
    val qs = results.collect { case (k, v, _) if headline(k) => "\"" + k + "\":" + cs(v) }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":${ms(total)},"unit":"sec","n":${results.size},""" +
      s""""failed":${failedQs.size},"queries":$qs,"ctl":{"min":${cs(ctlMin)},"max":${cs(ctlMax)}},""" +
      s""""full":"BENCH_FULL.json","sf":"$sfDir"}"""
    System.err.println(s"[bench] json line length: ${line.length}")
    // The payload line must be the LAST thing in a combined stdout+stderr
    // capture: silence Spark (shutdown-hook logs included) and stop the
    // session BEFORE printing, so nothing can trail the line.
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(line)
  }

  /** The stdout line's query subset: the reference-core dataflow plus the
    * most scale-relevant representative of each operator family. The
    * complete 130+-query record is in BENCH_FULL.json — this set only has
    * to keep the driver-visible line under the ~2000-char tail capture.
    */
  private[graft] val headline: Set[String] = Set(
    // reference core
    "fast_docs", "merge_fast_docs", "nt_parse", "nt_quarantine", "viaf_update",
    "q1_filter_project", "q4_groupby_collect", "q5_first_nonnull",
    "q6_join_chain", "q7_disjunctive_join", "q8_semi_join", "q9_merge_dedup",
    // relational heavies
    "q13_window", "q20_cube", "q22_range_join", "q23_asof_join",
    "q24_percentile", "q33_sql_surface", "q35_sessionize", "q39_resample",
    "q41_global_rank", "q42_window_distinct", "q43_interpolate", "table_diff",
    "tpch_q9", "tpch_q21",
    // dedup family
    "dedup_exact", "dedup_minhash_pairs", "dedup_clusters", "dedup_ppjoin",
    "dedup_ngram", "dedup_simhash", "dedup_winnow_pairs", "dedup_cosine_pairs",
    "dedup_incremental", "dedup_canonical", "dedup_spans", "dedup_stitch",
    // ANN / embeddings
    "ann_topk", "ann_ivf", "ann_lsh", "embed_neardup", "embed_clusters",
    // sketches
    "sketch_cms", "sketch_distinct", "sketch_frequent_by_lang",
    "sketch_quantiles", "sketch_hll_merge",
    // graph
    "graph_triangles", "graph_pagerank", "graph_labelprop", "graph_bfs",
    // text / quality / tokenization
    "text_langid", "text_quality", "text_lm_bigram", "text_bm25",
    "text_entropy", "text_boilerplate", "text_encode_ids", "bpe_merges",
    "decontaminate",
    // pipelines, sampling, layout
    "pipeline_curate", "pipeline_pretrain", "sample_temperature",
    "sample_weighted", "pack_sequences", "layout_zorder", "scd2_history",
    "events_attribution", "retrieval_mrr", "tpch_q17_style")
}
