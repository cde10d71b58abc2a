package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed suffix array over a tokenized document corpus — the exact
  * backbone of suffix-based substring dedup (Lee et al. '22 build one to
  * find duplicated spans; [[Dedup.dedupSpans]] is the k-gram
  * approximation of that pipeline, and this op closes the remaining
  * named-algorithm gap exactly).
  *
  * Construction is Manber–Myers prefix doubling (1990), the standard
  * distributed/external-memory SA skeleton (pSAC, Flick & Aluru '15):
  * suffixes are ranked by their length-h prefix, and one round turns h
  * into 2h by re-ranking on the pair `(rank(p), rank(p + h))`. A round
  * is one keyed self-join of the 4-long-column state plus one ranking
  * in the [[Rank.globalRowNumber]] topology (range-partitioned
  * checkpoint, local window, broadcast offsets — never a global
  * single-task sort), re-materialized per round with the previous
  * round's storage released immediately. Convergence is decided from
  * THREE sums carried by an `observe()` on the round's own
  * materializing action (no dedicated convergence job, and no wasted
  * confirmation round — see [[rankRound]]): the round that reaches the
  * E_2h = E_h fixpoint, or resolves every group to a singleton, is
  * detected as it lands.
  *
  * Suffixes are PER DOCUMENT (no corpus concatenation, so no sentinel
  * tokens): suffix (id, pos) = tokens[pos..end]. Identical suffixes
  * (full duplicates) tie forever and are broken (id, pos) in the emitted
  * row_number, which the accepted round's ranking already carries. The
  * seed ranking uses the space-joined length-`startPrefix` token slice
  * as its sort key — for a single-space-tokenized corpus (this engine's
  * text contract), string order of the joined slice equals
  * token-sequence order (space sorts below every printable character),
  * which is also what lets a SQL oracle reproduce the order with a plain
  * ORDER BY over suffix strings. The seed length defaults to ADAPTIVE
  * ([[AdaptiveSeed]]): a one-pass max-doc-length probe picks the
  * smallest power of two covering the longest document (capped at
  * [[AdaptiveSeedCap]]), so short-document corpora converge in the seed
  * round itself — the unresolved-group criterion (see [[rankRound]])
  * accepts it without a confirmation round. When the cap binds,
  * rounds-to-fixpoint is log2(longestRepeatedPrefix / seed) + 1 —
  * corpus size affects round WIDTH (keyed join + range exchange,
  * parallel at any size), never round COUNT.
  *
  * Output: one row per suffix — (idCol, pos, sa_rank), sa_rank the
  * 1-based position in (suffix, id, pos) order.
  */
object SuffixArray {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** One ranking round: range-checkpoint `in` on `keys`, lazily compute
    * global row numbers (the [[Rank.globalRowNumber]] topology: local
    * window per range partition + broadcast cumulative offsets) and the
    * group rank (min row number over `grpKeys`), then materialize the
    * STATE (5 long columns) and release the pre-rank checkpoint. The
    * state's own materializing action fills an observation carrying
    * Σgroup-rank, Σrow-number, an unresolved-group count, and (when
    * `prevRank` is set) Σprevious-rank — the sums that decide
    * convergence without any extra job:
    *   - Σg == Σprev  ⟺ no group split this round ⟺ E_2h = E_h, the
    *     fixpoint (sums strictly increase on any split: the later
    *     fragment's min row number exceeds the group's);
    *   - Σg == Σrn    ⟺ every group is a singleton — fully resolved,
    *     no future round can change anything;
    *   - unresolved == 0 ⟺ every multi-member group's LONGEST suffix
    *     fits inside the currently resolved prefix (`resolvedLen`, the
    *     `_rem` column carries each suffix's token length): members
    *     share a resolvedLen-prefix, so length ≤ resolvedLen makes the
    *     shared prefix the WHOLE suffix — the group is an
    *     identical-suffix class and can never split. This is the
    *     criterion that retires the otherwise-mandatory no-split
    *     CONFIRMATION round: the fixpoint test needs a round *after*
    *     the last split to observe Σg == Σprev, while this one fires on
    *     the converging round itself (full-duplicate docs keep ties
    *     forever, so the singleton test alone never fires on real
    *     corpora).
    */
  private def rankRound(in: DataFrame, keys: Seq[Column], grpKeys: Seq[String],
                        parts: Int, obsName: String, prevRank: Option[String],
                        resolvedLen: Long)
      : (Iterate.Materialized, Long, Option[Long], Long, Long) = {
    val ranged = Iterate.materialize(
      in.repartitionByRange(parts, keys: _*)
        .withColumn("_pid", spark_partition_id()))
    val offsets = ranged.df.groupBy("_pid").agg(count(lit(1)).as("_c"))
      .withColumn("_offset",
        coalesce(sum("_c").over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_pid", "_offset")
    val rn = ranged.df
      .withColumn("_local", row_number().over(
        Window.partitionBy("_pid").orderBy(keys: _*)))
      .join(broadcast(offsets), "_pid")
      .withColumn("rn", col("_offset") + col("_local"))
      .drop("_pid", "_local", "_offset")
    val grp = rn.groupBy(grpKeys.map(col): _*)
      .agg(min("rn").as("_g"), count(lit(1)).as("_n"), max("_rem").as("_gmax"))
    val obs = new Observation(obsName)
    val metrics = Seq(
      coalesce(sum("_g"), lit(0L)).as("s"),
      coalesce(sum("rn"), lit(0L)).as("srn"),
      coalesce(sum(when(col("_n") > 1L && col("_gmax") > resolvedLen, 1L)),
        lit(0L)).as("unresolved")) ++
      prevRank.map(c => coalesce(sum(col(c)), lit(0L)).as("sprev"))
    val state = Iterate.materialize(
      rn.join(grp, grpKeys)
        .observe(obs, metrics.head, metrics.tail: _*)
        .select(col("_id"), col("pos"), col("_g").as("_r"), col("rn"),
          col("_rem")))
    ranged.release()
    (state,
      obs.get("s").asInstanceOf[Long],
      prevRank.map(_ => obs.get("sprev").asInstanceOf[Long]),
      obs.get("srn").asInstanceOf[Long],
      obs.get("unresolved").asInstanceOf[Long])
  }

  /** Sentinel for [[build]]'s `startPrefix`: probe the corpus max
    * document token length (one cheap projection pass, an observe()
    * metric) and seed at the smallest power of two covering it, capped
    * at [[AdaptiveSeedCap]]. When the cap doesn't bind, every
    * non-identical suffix pair is separated by the seed itself and the
    * unresolved-group criterion accepts the SEED round — one ranking
    * round total, zero doubling rounds.
    */
  val AdaptiveSeed: Int = -1

  /** Upper bound for the adaptively chosen seed prefix: past this, the
    * space-joined seed key's shuffle bytes (O(suffixes × seed tokens))
    * outgrow what the saved doubling rounds (log₂ of repeat length,
    * 4-long-column exchanges) cost.
    */
  val AdaptiveSeedCap: Int = 256

  def build(df: DataFrame, textCol: String, idCol: String,
            startPrefix: Int = AdaptiveSeed, parts: Int = 32,
            maxRounds: Int = 16): DataFrame = {
    val seedLen =
      if (startPrefix != AdaptiveSeed) startPrefix
      else {
        // one-column probe; max token count rides an observe() metric
        val obs = new Observation("sa_probe")
        df.select(size(split(col(textCol), " ")).as("_n"))
          .observe(obs, coalesce(max(col("_n")), lit(0)).as("mx"))
          .foreach(_ => ())
        val maxLen = obs.get("mx").asInstanceOf[Int]
        math.min(AdaptiveSeedCap,
          math.max(java.lang.Integer.highestOneBit(math.max(maxLen, 1) * 2 - 1), 1))
      }
    val sfx = df
      .select(col(idCol).as("_id"), split(col(textCol), " ").as("_ws"))
      .select(col("_id"), col("_ws"),
        explode(expr("sequence(0, size(_ws) - 1)")).as("_p"))
      .select(col("_id"), col("_p").cast("long").as("pos"),
        array_join(expr(s"slice(_ws, _p + 1, $seedLen)"), " ").as("_p0"),
        (size(col("_ws")).cast("long") - col("_p")).as("_rem"))
    var (state, s0, _, srn0, unres0) = rankRound(sfx,
      Seq(col("_p0"), col("_id"), col("pos")), Seq("_p0"), parts, "sa_seed",
      None, seedLen.toLong)
    var h = seedLen.toLong
    var round = 1
    // every seed prefix unique, or every tied group already an
    // identical-suffix class (longest member fits inside the seed)
    var done = s0 == srn0 || unres0 == 0L
    while (!done && round <= maxRounds) {
      // suffix p extends with the rank of suffix p+h of the SAME doc; a
      // suffix shorter than h+1 tokens has no extension — rank 0 sorts
      // below every real rank (shorter-is-smaller, the prefix rule)
      val b = state.df.select(col("_id").as("_bid"), (col("pos") - h).as("_bpos"),
        col("_r").as("_r2"))
      val paired = state.df.join(b,
          col("_id") === col("_bid") && col("pos") === col("_bpos"), "left")
        .select(col("_id"), col("pos"), col("_r").as("_r1"),
          coalesce(col("_r2"), lit(0L)).as("_r2"), col("_rem"))
      val tR = System.nanoTime()
      val (next, sG, sPrev, sRn, unres) = rankRound(paired,
        Seq(col("_r1"), col("_r2"), col("_id"), col("pos")),
        Seq("_r1", "_r2"), parts, s"sa_round_$round", Some("_r1"), h * 2)
      state.release() // consumed into the new round's checkpoint
      state = next
      if (sys.env.contains("GRAFT_SA_DEBUG"))
        System.err.println(f"[sa] round $round h=$h sumRank=$sG " +
          f"prev=${sPrev.get} srn=$sRn unresolved=$unres " +
          f"secs=${(System.nanoTime() - tR) / 1e9}%.2f")
      // fixpoint (no split), every group singleton, or every remaining
      // group an identical-suffix class — all three are final
      done = sPrev.contains(sG) || sG == sRn || unres == 0L
      h *= 2
      round += 1
    }
    // A silent exit here would return an UNDER-REFINED (wrong) ranking:
    // suffixes still sharing a length-h prefix would keep tied group
    // ranks that the next doubling round would have split. Reachable
    // with a small startPrefix or pathologically long repeats — fail
    // loudly instead of emitting a wrong suffix array.
    require(done,
      s"suffix array did not converge within maxRounds=$maxRounds " +
        s"(reached prefix length $h); raise maxRounds or startPrefix")
    // at the fixpoint rn = row_number over (suffix, id, pos): groups are
    // exactly the identical-suffix classes and rn breaks them by (id, pos)
    state.df.select(col("_id").as(idCol), col("pos"), col("rn").as("sa_rank"))
  }

  /** LCP between each suffix and its successor in suffix-array order —
    * one row per consecutive pair: (idCol, pos, nbr_id, nbr_pos, lcp).
    * The longest repeated substring in the corpus is the max-LCP pair
    * (a repeat's two occurrences are SA-adjacent at the maximum), and
    * duplicated spans of length ≥ L are exactly the SA runs with
    * neighbor LCP ≥ L — the Lee et al. extraction. The per-pair compare
    * is the native codegen [[graft.functions.CommonPrefixLen]] loop.
    *
    * Scale shape — capped compare with escalation, NOT full-array
    * replication: each SA row carries only its first `cap` suffix
    * tokens into the rank self-join, so the shuffle payload is
    * O(suffixes × cap) instead of O(suffixes × doc_len) (the r12 form
    * attached the COMPLETE document token array to BOTH sides of every
    * pair — O(corpus_tokens × mean_doc_len) at 100 TB). A capped
    * compare is exact unless BOTH suffixes extend past the cap and the
    * compare saturated; only those pairs — repeats ≥ cap tokens, a
    * vanishing fraction of any real corpus — escalate to a second join
    * against the full token arrays, resuming the compare at offset
    * `cap`. With `exact = false` the escalation is skipped and `lcp` is
    * min(true LCP, cap) — all a threshold test `lcp >= L` needs
    * whenever L ≤ cap (the span-dedup case, [[Dedup.dedupSpansSa]]).
    *
    * Eager: the pair table (narrow: ids, positions, three longs)
    * materializes once and feeds the exact/saturated split — left lazy,
    * both branches would re-run the slice join. Its checkpoint is
    * reclaimed with the result's lineage (session releaseAll / cleaner
    * GC), the [[Dedup.dedupSpansImpl]] discipline.
    */
  def lcpNeighbors(df: DataFrame, textCol: String, idCol: String,
                   sa: DataFrame, cap: Int = 128,
                   exact: Boolean = true,
                   emitPrefix: Boolean = false): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val ws = df.select(col(idCol).as("_wid"), split(col(textCol), " ").as("_ws"))
    // lazy persist: the slice join feeds both sides of the rank self-join
    // below; the cache fills during the materializing job and is dropped
    // right after it
    val sliced = sa.join(ws, col(idCol) === col("_wid"))
      .select(col(idCol), col("pos"), col("sa_rank"),
        expr(s"slice(_ws, CAST(pos + 1 AS INT), $cap)").as("_sfx"),
        (size(col("_ws")).cast("long") - col("pos")).as("_rem"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nbr = sliced.select((col("sa_rank") - 1).as("_prev"),
      col(idCol).as("nbr_id"), col("pos").as("nbr_pos"),
      col("_sfx").as("_nsfx"), col("_rem").as("_nrem"))
    // emitPrefix: carry the space-joined capped prefix out as
    // `sfx_prefix` — for a pair with lcp >= cap this IS the shared
    // cap-token gram, sparing threshold consumers ([[Dedup.dedupSpansSa]])
    // a third split-and-slice join back to the token arrays
    val prefixCols =
      if (emitPrefix) Seq(array_join(col("_sfx"), " ").as("sfx_prefix"))
      else Seq.empty[Column]
    val base = Iterate.materialize(
      sliced.join(nbr, col("sa_rank") === col("_prev"))
        .select(Seq(col(idCol), col("pos"), col("nbr_id"), col("nbr_pos"),
          call_function("common_prefix_len", col("_sfx"), col("_nsfx"))
            .cast("long").as("_lcp0"),
          col("_rem"), col("_nrem")) ++ prefixCols: _*))
    sliced.unpersist()
    val saturated = col("_lcp0") === cap.toLong &&
      col("_rem") > cap.toLong && col("_nrem") > cap.toLong
    val outCols = Seq(col(idCol), col("pos"), col("nbr_id"), col("nbr_pos")) ++
      prefixCols.map(_ => col("sfx_prefix"))
    if (!exact)
      base.df.select(outCols :+ col("_lcp0").as("lcp"): _*)
    else {
      val done = base.df.where(!saturated)
        .select(outCols :+ col("_lcp0").as("lcp"): _*)
      val esc = base.df.where(saturated)
        .join(ws, col(idCol) === col("_wid"))
        .withColumnRenamed("_ws", "_wsa").drop("_wid")
        .join(ws, col("nbr_id") === col("_wid"))
        .select(outCols :+
          (lit(cap.toLong) + call_function("common_prefix_len",
            expr(s"slice(_wsa, CAST(pos + 1 + $cap AS INT), size(_wsa))"),
            expr(s"slice(_ws, CAST(nbr_pos + 1 + $cap AS INT), size(_ws))"))
            .cast("long")).as("lcp"): _*)
      done.unionByName(esc)
    }
  }
}
