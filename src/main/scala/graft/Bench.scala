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
    //
    // ADAPTIVE pass count (VERDICT r9 item 1): host steal only ever
    // INFLATES a pass, so the min over passes is the right steady-state
    // estimator — the failure mode in r7–r9 was a fixed pass count (3)
    // entirely inside a sustained contention window (q16_json recorded
    // 26.5 s vs 1.1 s steady). The loop now keeps running steady passes
    // until the two fastest REPRODUCE each other (within 30%) under
    // clean surrounding controls, up to 6 steady passes / a per-query
    // extra-time budget. Controls are interleaved BETWEEN passes, so each
    // pass has a before+after control — a pass is only "clean" when both
    // are ≤ CtlClean, which catches contention that starts or ends inside
    // the query window (the r9 fast_docs case: ctl 0.05 in the adjacent
    // window while the query itself ran 5× inflated — dispersion between
    // passes catches what a single adjacent control cannot).
    val CtlClean = 0.25 // 64M-row control median is ~0.09 s on this host
    val MaxSteady = 6
    val raw = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def onePass(i: Int): (Double, Boolean) = {
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
      onePass(1) // warm-up: plan compilation + codegen JIT, never counted
      // steady passes with interleaved controls: ctls(i) precedes pass i,
      // ctls(i+1) follows it.
      val ctls = scala.collection.mutable.ArrayBuffer(control())
      val steadyAll = scala.collection.mutable.ArrayBuffer.empty[(Double, Boolean)]
      var extra = 0.0
      var done = false
      while (!done) {
        val (t, ok) = onePass(steadyAll.size + 2)
        ctls += control()
        steadyAll += ((t, ok))
        if (steadyAll.size > 2) extra += t
        val clean = steadyAll.zipWithIndex.collect {
          case ((tt, true), i) if ctls(i) <= CtlClean && ctls(i + 1) <= CtlClean => tt
        }.sorted
        val converged = clean.size >= 2 && clean(1) <= 1.3 * clean(0)
        done = converged ||
          steadyAll.size >= MaxSteady ||
          (steadyAll.size >= 2 && extra > math.max(10.0,
            5.0 * steadyAll.collect { case (tt, true) => tt }
              .minOption.getOrElse(0.0)))
      }
      val okTimes = steadyAll.zipWithIndex.collect { case ((t, true), i) => (t, i) }
      val cleanTimes = okTimes.filter { case (_, i) =>
        ctls(i) <= CtlClean && ctls(i + 1) <= CtlClean }
      // record the fastest CLEAN pass when one exists; else the fastest
      // pass at all (flagged via its surrounding control below). The
      // recorded control is the worse of the recorded pass's two
      // neighbors — contamination stays attributable per query.
      val best = (if (cleanTimes.nonEmpty) cleanTimes else okTimes)
        .minByOption(_._1)
      if (steadyAll.size > 2 || cleanTimes.isEmpty)
        System.err.println(s"[bench] $name: ${steadyAll.size} steady passes, " +
          s"${cleanTimes.size} clean, recorded=${best.map(_._1).getOrElse(-1.0)}")
      best match {
        case Some((t, i)) => (name, t, math.max(ctls(i), ctls(i + 1)), true)
        case None         => (name, 0.0, ctls.last, false)
      }
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
