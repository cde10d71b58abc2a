package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents whose word-k-gram
  * overlap with an evaluation corpus exceeds a threshold — the standard
  * guard against test-set leakage in training-data pipelines.
  *
  * Scale shape: the benchmark side (eval sets, thousands of docs) is tiny
  * next to the corpus, so its distinct shingle hashes form a broadcast
  * build side — the corpus is tokenized once and probed in place, with NO
  * shuffle of corpus shingle rows; the only wide exchange is the final
  * per-doc aggregation on the doc id. Shingle hashing reuses the engine's
  * portable 60-bit md5 ([[Dedup.md5Int60]]), so the DuckDB oracle mirrors
  * it exactly.
  */
object Decontaminate {

  /** Per-corpus-document overlap report against `benchmark`:
    * `idCol, n_sh, n_shared, overlap_frac, contaminated`.
    *
    * `n_sh` counts the doc's distinct shingles, `n_shared` how many of
    * them appear anywhere in the benchmark; `contaminated` compares the
    * UNROUNDED ratio against `threshold` (as integer-free IEEE arithmetic,
    * deterministic across engines). Documents shorter than `k` tokens
    * have no shingles and are trivially clean — they are not emitted.
    */
  def overlap(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String,
      k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val corpusSh = Dedup.shingleRows(corpus, textCol, idCol, k)
      .select(col(idCol), col("n_sh"), Dedup.md5Int60(col("sh")).as("sh"))
    val benchSh = Dedup.shingleRows(benchmark, textCol, idCol, k)
      .select(Dedup.md5Int60(col("sh")).as("sh"))
      .distinct()
      .withColumn("_hit", lit(1))
    corpusSh
      .join(broadcast(benchSh), Seq("sh"), "left")
      .groupBy(col(idCol))
      .agg(
        max(col("n_sh")).cast("long").as("n_sh"),
        sum(coalesce(col("_hit"), lit(0))).as("n_shared"))
      .select(col(idCol), col("n_sh"), col("n_shared"),
        round(col("n_shared") / col("n_sh"), 4).as("overlap_frac"),
        (col("n_shared") >= col("n_sh") * lit(threshold)).cast("int").as("contaminated"))
  }
}
