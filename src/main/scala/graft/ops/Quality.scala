package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level quality signals for training-data curation, beyond the
  * per-document scores in the text queries (stopword ratio, langid):
  * signals that need a GLOBAL pass over the corpus.
  *
  * All outputs are integers (counts, basis points) or doubles derived
  * from integer sums with an explicit arithmetic shape, so every signal
  * is bit-reproducible across engines and cluster sizes.
  */
object Quality {

  /** Duplicate n-gram fraction (the Gopher/Dolma repetition signal): for
    * each document, the fraction of its distinct word k-grams that also
    * appear in at least `minDocs` documents corpus-wide. High fraction =
    * boilerplate / template text that exact and near dedup both miss
    * (the duplicated UNIT is the phrase, not the page).
    *
    * Scale shape: explode distinct shingles (native `word_shingles`),
    * hash to 60-bit ints, ONE shuffle on the shingle key for the global
    * document-frequency aggregate, a co-partitioned join back (reuses the
    * same key), then one shuffle on the doc id — the identical topology
    * to [[Dedup.ngramCandidates]], linear in corpus size, never a
    * pair-space join. Fraction is integer basis points (`x * 10000 div
    * n`), so there is no float to drift.
    *
    * Output: (idCol, n_grams, dup_grams, dup_frac_bp, keep) — total over
    * the input (documents with fewer than k tokens get n_grams = 0 and
    * keep = 1).
    */
  def dupGramFraction(df: DataFrame, textCol: String, idCol: String,
                      k: Int = 3, minDocs: Int = 2,
                      maxBp: Int = 8000): DataFrame = {
    val sh = Dedup.shingleRows(df, textCol, idCol, k)
      .select(col(idCol), col("n_sh"), Dedup.md5Int60(col("sh")).as("sh"))
    // each doc contributes a distinct shingle once → count(*) IS doc freq
    val docFreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val perDoc = sh.join(docFreq, "sh")
      .groupBy(col(idCol))
      .agg(max(col("n_sh")).cast("long").as("n_grams"),
        sum(when(col("df") >= minDocs, 1L).otherwise(0L)).as("dup_grams"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("dup_grams"), lit(0L)).as("dup_grams"))
      .withColumn("dup_frac_bp",
        when(col("n_grams") > 0, expr("dup_grams * 10000 div n_grams"))
          .otherwise(lit(0L)))
      .withColumn("keep", (col("dup_frac_bp") <= maxBp).cast("int"))
  }

  /** [[dupGramFraction]] with a RELATIVE boilerplate threshold: a gram
    * counts as duplicated when it appears in at least `minPermille`/1000
    * of the corpus's documents. Scale-invariant where the absolute
    * `minDocs` saturates (in any large corpus every common trigram
    * appears twice somewhere); pure integer comparison
    * (`df · 1000 ≥ N · minPermille`), so no float threshold to drift.
    * Same linear topology plus one broadcast one-row corpus count.
    */
  def dupGramFractionRelative(df: DataFrame, textCol: String, idCol: String,
                              k: Int = 3, minPermille: Int = 5,
                              maxBp: Int = 8000): DataFrame = {
    val n = df.agg(count(lit(1)).as("_nd"))
    val sh = Dedup.shingleRows(df, textCol, idCol, k)
      .select(col(idCol), col("n_sh"), Dedup.md5Int60(col("sh")).as("sh"))
    val docFreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val perDoc = sh.join(docFreq, "sh").crossJoin(broadcast(n))
      .groupBy(col(idCol))
      .agg(max(col("n_sh")).cast("long").as("n_grams"),
        sum(when(col("df") * 1000 >= col("_nd") * minPermille, 1L).otherwise(0L))
          .as("dup_grams"))
    df.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("dup_grams"), lit(0L)).as("dup_grams"))
      .withColumn("dup_frac_bp",
        when(col("n_grams") > 0, expr("dup_grams * 10000 div n_grams"))
          .otherwise(lit(0L)))
      .withColumn("keep", (col("dup_frac_bp") <= maxBp).cast("int"))
  }

  /** Per-group z-score outliers of an integer-valued column (e.g. length
    * outliers per language — truncation artifacts and concatenation blobs
    * both show up here). Group stats come from INTEGER sums (n, Σx, Σx²),
    * so mean/variance are identical doubles on every engine and partition
    * count; the z expression is written with one explicit shape
    * (`(x - s/n) / sqrt(ss/n - (s/n)²)`) that the oracle mirrors term by
    * term. Groups with zero variance produce no outliers.
    *
    * Range contract: Σx² must fit int64 — for values up to ~10⁴ that is
    * ~9×10¹⁰ rows per group (far beyond 100 TB of documents); for larger
    * value domains, rescale (the z-score is scale-invariant) rather than
    * switching to float sums, which would break run-to-run determinism.
    *
    * Scale shape: one aggregate to a tiny per-group stats table,
    * broadcast back over the corpus — no second shuffle of the data.
    */
  /** Cross-document boilerplate removal (the C4/CCNet cleaning step):
    * split each doc into fixed NON-overlapping `segWords`-word segments,
    * count each distinct segment's document frequency corpus-wide, drop
    * segments whose df exceeds `maxDfPermille` of the corpus doc count
    * (relative threshold — scale-invariant, like dupGramFractionRelative),
    * and reassemble each doc's surviving segments in order. Returns
    * `(idCol, n_seg, n_kept, clean_text)`.
    *
    * Scale shape: one (segment) shuffle for the df count and one for the
    * anti-join; the threshold bounds the boilerplate table at
    * ≤ total_segments·1000/(maxDfPermille·nDocs) rows, so Catalyst
    * broadcasts it when small and falls back to a shuffle anti-join when
    * not — either way no per-doc state beyond its own segment list.
    */
  def dropBoilerplate(df: DataFrame, textCol: String, idCol: String,
                      segWords: Int = 2, maxDfPermille: Int = 50): DataFrame = {
    // once-per-doc segment count for the final projection (cheap there);
    // split ONCE per doc before the lambda — `slice(split(...), i...)`
    // inside transform re-splits per segment (O(len²)/doc, interpreted)
    val nSegExpr = s"int(ceil(size(split($textCol, ' ')) / $segWords.0))"
    // segs feeds both the boilerplate-frequency agg and the rebuild join;
    // uncached on purpose — the identical explode subtrees share via
    // physical exchange reuse, and a lazy persist measured no faster at
    // sf0.1 (r16 A/B) while pinning executor storage a caller must sweep.
    val segs = df
      .select(col(idCol), split(col(textCol), " ").as("_ws"))
      .select(col(idCol), posexplode(expr(
        s"""transform(sequence(0, int(ceil(size(_ws) / $segWords.0)) - 1),
           | i -> array_join(slice(_ws, i * $segWords + 1, $segWords), ' '))"""
          .stripMargin.replace("\n", " ")))
      .as(Seq("seg_idx", "seg")))
    val nDocs = df.agg(countDistinct(col(idCol)).as("nd"))
    val boiler = segs.groupBy("seg").agg(countDistinct(col(idCol)).as("seg_df"))
      .crossJoin(broadcast(nDocs))
      .where(col("seg_df") * lit(1000L) > col("nd") * lit(maxDfPermille.toLong))
      .select("seg")
    val rebuilt = segs.join(boiler, Seq("seg"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(struct(seg_idx, seg))), s -> s.seg)"),
          " ").as("clean_text"))
    df.select(col(idCol), expr(nSegExpr).cast("long").as("n_seg"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), col("n_seg"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Robust per-group location/spread: lower median (the ⌈n/2⌉-th order
    * statistic) and MAD (median absolute deviation), plus outlier counts
    * at 1/2/3 MADs. The robust twin of [[zScoreOutliers]] — immune to the
    * heavy tail that drags a mean-based z.
    *
    * Medians are selected from VALUE-COUNT tables, never a per-row sort:
    * aggregate (group, value) counts, cumulative-sum over the
    * value-ordered per-group window (bounded by DISTINCT values, not
    * rows — the same aggregate-first shape as the equi-depth histogram),
    * pick the value whose cumulative count straddles ⌈n/2⌉. Repeat on
    * |v − med| for the MAD. Everything integer → bit-exact on any
    * engine and partition count.
    *
    * Output: (grpCol, n, med, mad, out_1mad, out_2mad, out_3mad).
    */
  /** Lower median (the ⌈n/2⌉-th order statistic) of `v` per `grpCol`,
    * selected from a VALUE-COUNT table, never a per-row sort: the
    * cumulative-sum window is bounded by DISTINCT values, not rows (the
    * aggregate-first shape shared with the equi-depth histogram).
    * Shared by [[madStats]] and [[madOutlierRows]].
    */
  private def lowerMedian(in: DataFrame, grpCol: String, v: String,
                          out: String): DataFrame = {
    val counts = in.groupBy(col(grpCol), col(v)).agg(count(lit(1)).as("_c"))
    val wCum = Window.partitionBy(grpCol).orderBy(col(v))
      .rowsBetween(Window.unboundedPreceding, 0)
    counts
      .withColumn("_cum", sum("_c").over(wCum))
      .withColumn("_n", sum("_c").over(Window.partitionBy(grpCol)))
      // the lower median sits at position ⌈n/2⌉ = (n+1) div 2
      .where(col("_cum") - col("_c") < expr("(_n + 1) div 2") &&
        expr("(_n + 1) div 2") <= col("_cum"))
      .select(col(grpCol), col(v).cast("long").as(out))
  }

  def madStats(df: DataFrame, valCol: String, grpCol: String): DataFrame = {
    val med = lowerMedian(df.select(col(grpCol), col(valCol)), grpCol, valCol, "med")
    val withDev = df.select(col(grpCol), col(valCol))
      .join(med, grpCol)
      .withColumn("_dev", abs(col(valCol).cast("long") - col("med")))
    val mad = lowerMedian(withDev, grpCol, "_dev", "mad")
    withDev.join(mad, grpCol)
      .groupBy(col(grpCol))
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("med"), max(col("mad")).as("mad"),
        sum(when(col("_dev") > col("mad"), 1L).otherwise(0L)).as("out_1mad"),
        sum(when(col("_dev") > col("mad") * 2, 1L).otherwise(0L)).as("out_2mad"),
        sum(when(col("_dev") > col("mad") * 3, 1L).otherwise(0L)).as("out_3mad"))
  }

  /** The anomalous ROWS behind [[madStats]]: rows whose |value − group
    * median| exceeds `k`·MAD, with the evidence attached (med, dev,
    * mad). All original columns ride through — the medians join back on
    * the group key — so callers keep their secondary keys (e.g. the
    * day of an anomalous daily volume). Integer-exact end to end; the
    * robust baseline means one heavy day cannot mask itself by dragging
    * the group mean. Output adds `med`, `dev`, `mad` — reserved names
    * the input frame must not already carry.
    */
  def madOutlierRows(df: DataFrame, valCol: String, grpCol: String,
                     k: Int = 3): DataFrame = {
    val med = lowerMedian(df.select(col(grpCol), col(valCol)), grpCol, valCol, "med")
    val withDev = df.join(med, grpCol)
      .withColumn("dev", abs(col(valCol).cast("long") - col("med")))
    val mad = lowerMedian(withDev.select(col(grpCol), col("dev")), grpCol, "dev", "mad")
    withDev.join(mad, grpCol).where(col("dev") > col("mad") * k)
  }

  /** Top-bigram repetition signal (the second Gopher/Dolma repetition
    * family, complementing [[dupGramFraction]]'s cross-document signal):
    * for each document, the fraction of its characters covered by its
    * single most frequent word bigram — catches WITHIN-document loops
    * ("click here click here …") that corpus-level df never sees.
    *
    * Tie-break is deterministic: highest count, then lexicographically
    * smallest bigram, expressed as one partial-aggregable
    * `min(struct(-cnt, bigram))` — no window, no driver state. Fraction
    * is integer basis points (`cnt · len(bigram) · 10000 div chars`), so
    * nothing floats.
    *
    * Scale shape: one (doc, bigram) shuffle + one doc shuffle, both
    * map-side combinable; linear in corpus tokens.
    *
    * Output: (idCol, n_bigrams, top_bigram, top_cnt, rep_bp); documents
    * with fewer than two words get (0, '', 0, 0).
    */
  def topBigramFraction(df: DataFrame, textCol: String, idCol: String,
                        charsCol: String): DataFrame = {
    // split ONCE per doc, then zip shifted slices — the earlier
    // per-element `element_at(split(...), i)` lambda re-split the text
    // for every bigram position, an O(len²)-per-doc interpreter path
    // that benched at 3.0 s vs 1.2 s for this shape at sf0.1
    val bi = df
      .select(col(idCol), split(col(textCol), " ").as("_ws"))
      .where(size(col("_ws")) >= 2)
      .select(col(idCol), explode(arrays_zip(
        expr("slice(_ws, 1, size(_ws) - 1)").as("l"),
        expr("slice(_ws, 2, size(_ws) - 1)").as("r"))).as("z"))
      .select(col(idCol), concat(col("z.l"), lit(" "), col("z.r")).as("bg"))
    val top = bi.groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_bigrams"),
        min(struct((-col("cnt")).as("neg"), col("bg").as("bg"))).as("_t"))
      .select(col(idCol), col("n_bigrams"),
        col("_t.bg").as("top_bigram"), (-col("_t.neg")).as("top_cnt"))
    df.select(col(idCol), col(charsCol))
      .join(top, Seq(idCol), "left")
      .select(col(idCol), col(charsCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top_bigram"), lit("")).as("top_bigram"),
        coalesce(col("top_cnt"), lit(0L)).as("top_cnt"))
      // integer div (not Column./, which is double division)
      .withColumn("rep_bp",
        when(col(charsCol) > 0,
          expr(s"top_cnt * length(top_bigram) * 10000 div $charsCol"))
          .otherwise(lit(0L)))
      .drop(charsCol)
  }

  /** Row-count bound under which [[winsorizedClipMeans]] keeps the
    * per-group row_number window (exact, minimal fixed cost at toy/test
    * scale). Above it, the histogram-CDF path takes over: its shuffle is
    * bounded by distinct (group, value) pairs after map-side combine, and
    * its only window runs over distinct VALUES per group — never a
    * one-task sort of a dominant group's rows.
    */
  val WinsorWindowLimit = 10_000_000L

  /** Per-group percentile winsorization: clip `valCol` at the
    * element-valued qLow/qHigh quantiles (rank-index selection — the
    * value at rank ceil(q·n) under ascending order; integers end to end,
    * no interpolated floats), then report the clipped mean ×100 as an
    * integer rational. Output: (grpCol, n_docs, p05, p95, clip_mean_x100).
    *
    * Two exact paths, chosen by input size (one metadata-cheap count):
    *  - window path (≤ [[WinsorWindowLimit]] rows): row_number per group —
    *    the oracle-shaped formulation;
    *  - histogram path: groupBy (group, value) counts → cumulative sum
    *    over the per-group sorted DISTINCT values → p_q = min value whose
    *    CDF ≥ ceil(q·n). Identical result (equal values are rank-adjacent,
    *    so the value at any rank inside a tie run is the run's value),
    *    but nothing row-sized is ever sorted in one task — the 100 TB
    *    shape for per-group exact quantiles (WinsorPathSpec proves the
    *    paths agree).
    */
  def winsorizedClipMeans(df: DataFrame, grpCol: String, valCol: String,
                          idCol: String, qLow: Double = 0.05,
                          qHigh: Double = 0.95,
                          windowLimit: Long = WinsorWindowLimit): DataFrame = {
    val n = df.count()
    val bounds =
      if (n <= windowLimit) {
        val w = Window.partitionBy(grpCol).orderBy(valCol, idCol)
        df.select(col(grpCol), col(valCol),
            row_number().over(w).as("rn"),
            count(lit(1)).over(Window.partitionBy(grpCol)).as("n"))
          .groupBy(grpCol).agg(
            max(when(col("rn") === ceil(col("n") * qLow), col(valCol))).as("p05"),
            max(when(col("rn") === ceil(col("n") * qHigh), col(valCol))).as("p95"),
            max(col("n")).as("n"))
      } else {
        val wv = Window.partitionBy(grpCol).orderBy(valCol)
        df.groupBy(col(grpCol), col(valCol)).agg(count(lit(1)).as("_c"))
          .select(col(grpCol), col(valCol),
            sum("_c").over(wv).as("cum"),
            sum("_c").over(Window.partitionBy(grpCol)).as("n"))
          .groupBy(grpCol).agg(
            min(when(col("cum") >= ceil(col("n") * qLow), col(valCol))).as("p05"),
            min(when(col("cum") >= ceil(col("n") * qHigh), col(valCol))).as("p95"),
            max(col("n")).as("n"))
      }
    df.select(col(grpCol), col(valCol))
      .join(broadcast(bounds), grpCol)
      .select(col(grpCol), col("n"), col("p05"), col("p95"),
        greatest(col("p05"), least(col("p95"), col(valCol))).as("_clip"))
      .groupBy(grpCol)
      .agg(first("n").as("n_docs"), first("p05").as("p05"), first("p95").as("p95"),
        expr("CAST(100 * sum(_clip) div count(1) AS BIGINT)").as("clip_mean_x100"))
  }

  def zScoreOutliers(df: DataFrame, valCol: String, grpCol: String,
                     zMax: Double = 2.0): DataFrame = {
    val stats = df.groupBy(col(grpCol)).agg(
      count(lit(1)).cast("double").as("_n"),
      sum(col(valCol)).cast("double").as("_s"),
      // widen BEFORE multiplying: int32 squares overflow silently (non-ANSI
      // wrap) at |x| >= 46341; the int64 contract above assumes the product
      // itself is computed in long arithmetic
      sum(col(valCol).cast("long") * col(valCol).cast("long"))
        .cast("double").as("_ss"))
    val mean = col("_s") / col("_n")
    val variance = col("_ss") / col("_n") - mean * mean
    df.join(broadcast(stats), grpCol)
      .where(variance > 0)
      .withColumn("z", (col(valCol).cast("double") - mean) / sqrt(variance))
      .where(abs(col("z")) > zMax)
      .drop("_n", "_s", "_ss")
  }
}
