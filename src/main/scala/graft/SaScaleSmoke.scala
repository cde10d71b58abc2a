package graft

import org.apache.spark.sql.functions._

/** Scale smoke for the r14 suffix-array rebuild (results in NOTES.md):
  * the DOUBLING path at millions of suffixes — specs exercise it at toy
  * size; this drives the 100 TB-shaped configuration (short explicit
  * seed + many narrow rank rounds, the layout that avoids the seed
  * key's O(suffixes × seed-tokens) payload blowup).
  *
  * Corpus: `docs` documents of `len` tokens; every (1/10)th doc starts
  * with a SHARED `rep`-token block (the planted long repeat — far past
  * the seed, so rank refinement must double from `seed` to ≥ rep), the
  * rest hash-random. Verification:
  *   (a) sa_rank is a permutation of 1..N (count / min / max /
  *       distinct);
  *   (b) a sampled set of ADJACENT rank pairs joins back to the full
  *       suffix strings and asserts exact lexicographic order — space
  *       joins below every printable char, so string ≤ is token ≤;
  *   (c) dedupSpansSa (bounded path) hash-equals dedupSpansExact over
  *       the same corpus — the r14 structural-run pipeline at volume.
  *
  * Usage: SaScaleSmoke [docs] [len] [rep] [seed]
  */
object SaScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 2000
    val len = if (args.length > 1) args(1).toInt else 2500
    val rep = if (args.length > 2) args(2).toInt else 2100
    val seed = if (args.length > 3) args(3).toInt else 32
    val spark = GraftSession.local("graft-sa-scale")
    import spark.implicits._

    // shared block token: f(j); random tail token: f(doc, j) — both via
    // md5-derived ints over a 1000-token vocabulary
    val docs = spark.range(nDocs).select(col("id").as("doc_id"))
      .select(col("doc_id"), array_join(expr(
        s"""transform(sequence(0, $len - 1), j ->
           |  CASE WHEN doc_id % 10 = 0 AND j < $rep
           |    THEN concat('t', pmod(xxhash64(concat('s', j)), 1000))
           |    ELSE concat('t', pmod(xxhash64(concat(doc_id, ':', j)), 1000))
           |  END)""".stripMargin.replace("\n", " ")), " ").as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSfx = docs.select(sum(size(split(col("text"), " ")))).head.getLong(0)
    System.err.println(s"[sa-scale] $nDocs docs, $nSfx suffixes, " +
      s"planted ${nDocs / 10}-doc shared $rep-token block, seed=$seed")

    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[sa-scale] $tag ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val sa = time(s"build (doubling path, seed=$seed)") {
      val s = graft.ops.SuffixArray.build(docs, "text", "doc_id",
        startPrefix = seed, maxRounds = 20)
      s.write.format("noop").mode("overwrite").save(); s
    }
    // (a) permutation
    val perm = sa.agg(count(lit(1)).as("n"), min("sa_rank").as("mn"),
      max("sa_rank").as("mx"), countDistinct("sa_rank").as("d")).head
    require(perm.getLong(0) == nSfx && perm.getLong(1) == 1L &&
      perm.getLong(2) == nSfx && perm.getLong(3) == nSfx,
      s"sa_rank is not a permutation of 1..$nSfx: $perm")
    System.err.println(s"[sa-scale] permutation OK (n=$nSfx)")

    // (b) sampled exact adjacent order: ~50k pairs, full suffix strings
    time("adjacent-order sample check") {
      val sampled = sa.where(pmod(xxhash64(col("sa_rank")), lit(100L)) === 0L)
        .select(col("sa_rank").as("r"))
      val picked = sa.join(sampled.select(col("r").as("sa_rank")), Seq("sa_rank"))
        .unionByName(sa.join(sampled.select((col("r") + 1).as("sa_rank")),
          Seq("sa_rank")))
        .distinct()
      val ws = docs.select(col("doc_id").as("_wid"),
        split(col("text"), " ").as("_ws"))
      val strs = picked.join(ws, col("doc_id") === col("_wid"))
        .select(col("sa_rank"),
          array_join(expr("slice(_ws, CAST(pos + 1 AS INT), size(_ws))"), " ")
            .as("sfx"))
      val bad = strs.alias("a")
        .join(strs.alias("b"), col("a.sa_rank") + 1 === col("b.sa_rank"))
        .where(col("a.sfx") > col("b.sfx"))
        .count()
      require(bad == 0L, s"$bad adjacent pairs out of order")
    }

    // (c) span-dedup parity at volume (bounded path vs exact grams)
    time("dedupSpansSa == dedupSpansExact at volume") {
      def digest(df: org.apache.spark.sql.DataFrame) = df
        .agg(sum(col("n_kept")).as("kept"), sum(col("n_tok")).as("tok"),
          expr("bit_xor(xxhash64(doc_id, clean_text))").as("h")).head
      val viaSa = digest(
        graft.ops.Dedup.dedupSpansSa(docs, "text", "doc_id", k = 50))
      val exact = digest(
        graft.ops.Dedup.dedupSpansExact(docs, "text", "doc_id", k = 50))
      require(viaSa == exact, s"span-dedup parity broke: $viaSa vs $exact")
      System.err.println(s"[sa-scale] parity OK: kept ${viaSa.getLong(0)} " +
        s"of ${viaSa.getLong(1)} tokens")
    }

    // (d) APPEND section (r15): warm-start vs full recompute at volume.
    // The stored corpus is represented only by its persisted state
    // (spanGramIndex + spanCovered, both materialized up front — the
    // "yesterday" artifacts); the batch re-plants the shared block in 20
    // new docs plus fresh-random docs, so the merge exercises
    // cross-corpus duplication against hot grams. The warm-start path
    // must hash-equal the full recompute, and its wall-clock is the
    // number that matters: it must not pay the O(n log n) re-sort.
    locally {
      val k = 50
      val batch = spark.range(nDocs, nDocs + 100).select(col("id").as("doc_id"))
        .select(col("doc_id"), array_join(expr(
          s"""transform(sequence(0, $len - 1), j ->
             |  CASE WHEN doc_id % 5 = 0 AND j < $rep
             |    THEN concat('t', pmod(xxhash64(concat('s', j)), 1000))
             |    ELSE concat('t', pmod(xxhash64(concat(doc_id, ':', j)), 1000))
             |  END)""".stripMargin.replace("\n", " ")), " ").as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      batch.count()
      // the index persists BUCKETED on gram — the deploy shape: the batch
      // probe join shuffles only the batch to the index's bucketing, the
      // stored side is scanned in place with NO exchange (an unbucketed
      // in-memory index measured SLOWER than the full recompute here:
      // re-shuffling O(distinct grams × k tokens) of index strings is the
      // same payload the full build sorts)
      val idx = time("state build: spanGramIndex(stored) → bucketed table") {
        spark.sql("DROP TABLE IF EXISTS graft_span_idx")
        graft.ingest.Sinks.writeBucketed(
          graft.ops.Dedup.spanGramIndex(docs, "text", "doc_id", k),
          "graft_span_idx", "gram", numBuckets = 32)
        spark.table("graft_span_idx")
      }
      val cov = time("state build: spanCovered(stored)") {
        val c = graft.ops.Iterate.materialize(
          graft.ops.Dedup.spanCovered(docs, "text", "doc_id", k))
        c.df
      }
      def digest(df: org.apache.spark.sql.DataFrame) = df
        .agg(sum(col("n_kept")).as("kept"), sum(col("n_tok")).as("tok"),
          expr("bit_xor(xxhash64(doc_id, clean_text))").as("h")).head
      val inc = time("append: dedupSpansSaIncremental (warm-start)") {
        digest(graft.ops.Dedup.dedupSpansSaIncremental(docs, batch,
          "text", "doc_id", k, priorIndex = idx, priorCovered = cov))
      }
      val full = time("append: dedupSpansSa full recompute (baseline)") {
        digest(graft.ops.Dedup.dedupSpansSa(docs.unionByName(batch),
          "text", "doc_id", k))
      }
      require(inc == full, s"warm-start parity broke: $inc vs $full")
      System.err.println(s"[sa-scale] append parity OK: kept " +
        s"${inc.getLong(0)} of ${inc.getLong(1)} tokens")
    }
    spark.stop()
  }
}
