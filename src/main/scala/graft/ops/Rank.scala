package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Term-importance ranking over a document corpus — the scoring side of
  * corpus curation (keyword extraction, boilerplate detection, search).
  *
  * Scores are BM25 (Robertson et al., TREC-3) with one deliberate twist:
  * the idf factor is the RATIONAL Robertson-Sparck-Jones form
  * `(N - df + 0.5) / (df + 0.5)` without the usual log. The log is a
  * monotone transform of a per-term constant, so per-term score ORDER is
  * unchanged; what the rational form buys is bit-exact cross-engine
  * reproducibility — IEEE-754 specifies +,*,/ exactly, while `ln` is
  * implementation-defined and flips rounded digits between libms. At
  * 100 TB, "same answer on every engine that touches the table" beats a
  * cosmetically conventional score scale.
  *
  * Plan shape: explode → two key-partitioned hash aggregations
  * (doc-term, term) → broadcast of the global doc count/avgdl → per-doc
  * window top-k. Every shuffle is on a natural key; nothing is quadratic.
  */
object Rank {

  /** Top-`topK` terms per document by BM25 score.
    * Output: `idCol, term, tf, doc_freq, score` (score rounded to 4dp;
    * ties broken by term ascending for determinism).
    *
    * The doc-term frequency table feeds every downstream factor, and Spark
    * does not share identical subplans — left declarative, the corpus gets
    * tokenized and aggregated once PER FACTOR (a 4× scan, fatal at scale).
    * So `tf` is persisted and everything derives from it: doc_freq as a
    * term-partitioned window, dl as a doc-partitioned window immediately
    * before the doc-partitioned top-k window (consecutive same-key windows
    * share one exchange), and the two global scalars as a broadcast. One
    * scan, one (doc, term) shuffle, two window exchanges. EAGER like the
    * ingest ops: materialized via [[Iterate.scoped]] so the tf cache is
    * released before returning.
    */
  def bm25TopTerms(docs: DataFrame, textCol: String, idCol: String,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 3): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(split(lower(col(textCol)), " ")).as("term"))
      .where(col("term") =!= "")
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val globals = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("dl")) / count(lit(1))).as("avgdl"))
    val scored = tf
      .withColumn("doc_freq", count(lit(1)).over(Window.partitionBy("term")))
      .withColumn("dl", sum(col("tf")).over(Window.partitionBy(idCol)))
      .crossJoin(broadcast(globals))
      .withColumn("score",
        (col("n_docs") - col("doc_freq") + lit(0.5)) / (col("doc_freq") + lit(0.5)) *
          (col("tf") * (lit(k1) + 1)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
    val w = Window.partitionBy(idCol).orderBy(col("score").desc, col("term"))
    graft.ops.Iterate.scoped(
      scored
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= topK)
        .select(col(idCol), col("term"), col("tf"), col("doc_freq"),
          round(col("score"), 4).as("score")),
      tf)
  }

  /** Global row numbers WITHOUT the single-partition window trap: an
    * un-partitioned `row_number().over(Window.orderBy(...))` moves every
    * row of the table into ONE task — the classic plan that works in a
    * demo and dies at 100 TB. Here the data range-partitions on the sort
    * key (a real range exchange, parallel at any size), each partition
    * windows LOCALLY (partitioned by partition id), and a tiny
    * per-partition count table — at most `parts` rows — turns local
    * ranks into global ones via cumulative offsets and a broadcast join.
    *
    * `sortCols` must be a total order (include a unique tiebreaker).
    * The range-partitioned frame materializes once (checkpoint/persist
    * via [[Iterate.materialize]]) because the partition boundaries are
    * sampled per execution — the count pass and the rank pass MUST see
    * the same physical partitioning, and two independent executions of
    * a range exchange need not agree. Result frame carries `rn`; caller
    * releases nothing (the materialized input is dropped with the
    * returned frame's lineage on session cleanup).
    */
  /** Exact per-group k-tiles WITHOUT the per-group single-task window
    * trap: `ntile(k).over(Window.partitionBy(group).orderBy(...))` puts
    * each GROUP in one task — fatal when a group is a whole language of
    * a 100 TB corpus. Here ONE [[globalRowNumber]] pass ranks the rows
    * range-partitioned on `(group, sortCols)` — parallel at any size —
    * and a broadcast per-group (count, cumulative offset) table turns
    * global row numbers into within-group ones; the tile is then the
    * closed form `1 + (r−1)·k div n`. (Block sizes differ from SQL
    * NTILE's front-loaded remainder — this variant's assignment is a
    * pure expression both engines can compute without a second pass.)
    * `sortCols` must totally order rows WITHIN a group. Adds `tile`.
    */
  def globalNtile(df: DataFrame, groupCol: String,
                  sortCols: Seq[org.apache.spark.sql.Column], k: Int,
                  parts: Int = 32): DataFrame = {
    val ranked = globalRowNumber(df, col(groupCol) +: sortCols, parts)
    val offsets = df.groupBy(groupCol).agg(count(lit(1)).as("_n_g"))
      .withColumn("_off",
        coalesce(sum("_n_g").over(Window.orderBy(groupCol)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    ranked.join(broadcast(offsets), groupCol)
      .withColumn("tile",
        expr(s"CAST(1 + ((rn - _off - 1) * $k) div _n_g AS INT)"))
      .drop("rn", "_n_g", "_off")
  }

  def globalRowNumber(df: DataFrame, sortCols: Seq[org.apache.spark.sql.Column],
                      parts: Int = 32): DataFrame = {
    val ranged = Iterate.materialize(
      df.repartitionByRange(parts, sortCols: _*)
        .withColumn("_pid", spark_partition_id())).df
    val offsets = ranged.groupBy("_pid").agg(count(lit(1)).as("_c"))
      .withColumn("_offset",
        coalesce(sum("_c").over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_pid", "_offset")
    val localW = Window.partitionBy("_pid").orderBy(sortCols: _*)
    ranged
      .withColumn("_local", row_number().over(localW))
      .join(broadcast(offsets), "_pid")
      .withColumn("rn", col("_offset") + col("_local"))
      .drop("_pid", "_local", "_offset")
  }

  /** Global running sum of `valCol` under a total order, without a global
    * single-task window: range-partition on the sort key, cumulate
    * locally per partition, then add each partition's broadcast prefix
    * offset (the [[globalRowNumber]] topology — the offsets table is
    * `parts` rows, so ITS window is trivially small). `sortCols` must be
    * a total order for a deterministic result. Adds `cumCol` (inclusive
    * running sum, BIGINT for integer inputs).
    */
  def globalCumSum(df: DataFrame, sortCols: Seq[org.apache.spark.sql.Column],
                   valCol: String, cumCol: String,
                   parts: Int = 32): DataFrame = {
    val ranged = Iterate.materialize(
      df.repartitionByRange(parts, sortCols: _*)
        .withColumn("_pid", spark_partition_id())).df
    val offsets = ranged.groupBy("_pid").agg(sum(col(valCol)).as("_s"))
      .withColumn("_offset",
        coalesce(sum("_s").over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_pid", "_offset")
    val localW = Window.partitionBy("_pid").orderBy(sortCols: _*)
    ranged
      .withColumn("_local", sum(col(valCol)).over(localW))
      .join(broadcast(offsets), "_pid")
      .withColumn(cumCol, col("_offset") + col("_local"))
      .drop("_pid", "_local", "_offset")
  }
}
