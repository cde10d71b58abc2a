package graft

import org.apache.spark.sql.functions._

/** Scale smoke for the round-9 rewrites: replicate the sf0.1 fixtures
  * (id-shifted copies, so keys stay distinct) and drive the de-shuffled
  * operators at 10–20× the bench scale — the point where a plan that
  * secretly shuffles per-row state stops being "fast at toy scale".
  * Prints one line per probe; results recorded in NOTES.md.
  *
  * Usage: Round9Smoke [sfDir] [docCopies] [vecCopies]
  */
object Round9Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val docCopies = if (args.length > 1) args(1).toInt else 20
    val vecCopies = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.local("graft-r9-smoke")
    import spark.implicits._

    val docs0 = Tables.load(spark, sfDir, "documents")
    val docs = (0 until docCopies).map { c =>
      docs0.withColumn("doc_id", col("doc_id") + lit(c * 10000000L))
    }.reduce(_ unionByName _)
    val emb0 = Tables.load(spark, sfDir, "embeddings")
    val emb = (0 until vecCopies).map { c =>
      emb0.withColumn("vec_id", col("vec_id") + lit(c * 10000000L))
    }.reduce(_ unionByName _)

    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"R9_SMOKE $tag rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      GraftSession.releaseAll(spark)
    }

    val nDocs = docs.count()
    val nVecs = emb.count()
    println(s"R9_SMOKE corpus docs=$nDocs vecs=$nVecs")

    // zero-shuffle gopher stats: must scale linearly (map-only)
    time("gopher_stats") {
      docs.select(col("doc_id"), Functions.gopherStats(col("text")).as("g"),
          Functions.wordSetHits(col("text"), SparkEntry.stopEnPublic).as("sh"))
        .where(col("g.n_tok") >= 10 && col("sh") >= 2)
        .count()
    }

    // shuffle-free ADC: one row per vector + broadcast LUT; corpus 10×
    time("pq_adc_topk") {
      val q = emb.where(col("vec_id") < 5)
      // the ADC search shape over the replicated corpus (hash-derived
      // codes/LUT stand in for the trained codebook — the plan shape,
      // not the values, is what the probe measures)
      val codes = emb.select(col("vec_id"),
        expr("transform(sequence(0, 7), m -> CAST(pmod(hash(vec_id, m), 16) AS INT))").as("codes"))
      val lut = q.select(col("vec_id").as("q_id"),
        expr("transform(sequence(0, 7), m -> transform(sequence(0, 15), c -> CAST(pmod(hash(q_id, m, c), 1000) AS DOUBLE)))").as("luts"))
      val scored = codes.crossJoin(broadcast(lut))
        .select(col("q_id"), col("vec_id").as("neighbor_id"),
          expr("aggregate(zip_with(codes, luts, (c, l) -> element_at(l, CAST(c + 1 AS INT))), CAST(0 AS DOUBLE), (a, x) -> a + x)").as("adc2"))
      graft.ops.TopK.topKPerGroupExecRanked(scored, Seq("q_id"),
        Seq(("adc2", false), ("neighbor_id", false)), 5, "rank").count()
    }

    // MMR re-rank at 10× corpus: candidate fetch linear, greedy row-local
    time("mmr_rerank") {
      val q = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val cand = graft.ops.Similarity.bruteForceTopK(emb, q, "vec_id",
          "embedding", "q_id", "q_emb", 20, dim = 64)
        .select(col("q_id"), col("neighbor_id").as("id"), col("cos").as("rel"))
      graft.ops.Similarity.mmrRerank(emb, cand, "vec_id", "embedding",
        "q_id", "id", "rel", k = 5, lambda = 0.7, mu = 0.3).count()
    }

    // histogram-CDF winsorize path (the >10M-row branch, forced)
    time("winsorize_hist") {
      graft.ops.Quality.winsorizedClipMeans(
        docs.select("lang", "doc_id", "n_chars"), "lang", "n_chars", "doc_id",
        windowLimit = 0L).count()
    }

    // curation capstone over the replicated corpus
    time("pipeline_curation") {
      val st = docs.select(col("doc_id"), col("lang"), col("text"),
        Functions.gopherStats(col("text")).as("g"))
      val q2 = st.where(col("g.n_tok") >= 10 && col("g.n_tok") <= 200)
        .select(col("doc_id"), col("lang"), col("text"), col("g.n_tok").as("n_tok"))
      val exKeep = q2.groupBy(md5(col("text")).as("_h"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      q2.join(exKeep, "doc_id").groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("n_tok").as("tok")).count()
    }

    spark.stop()
  }
}
