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
                  parts: Int = 0): DataFrame = {
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

  /** Global row numbers WITHOUT the single-partition window trap: an
    * un-partitioned `row_number().over(Window.orderBy(...))` moves every
    * row of the table into ONE task — the classic plan that works in a
    * demo and dies at 100 TB. r14 topology, shared with the suffix-array
    * build ([[SuffixArray.sortedRanking]]): sort WITHIN the range
    * exchange, checkpoint with a monotonically-increasing id assigned in
    * sorted order, and turn ids into global row numbers as a PURE
    * EXPRESSION from a collected per-partition (min id, count) table —
    * a counters-class driver value. The former shape windowed over
    * `_pid` AFTER the checkpoint, and since Spark cannot prove a
    * LogicalRDD's clustering, that window re-exchanged the ENTIRE table
    * by hash (plus a broadcast join) per consumer — both gone
    * ([[graft.plans.PartitionIdWindowCheck]] now lints the pattern).
    *
    * `sortCols` must be a total order (include a unique tiebreaker).
    * The frame materializes once because partition boundaries are
    * sampled per execution — the offset pass and the rank expression
    * MUST see the same physical partitioning. Result carries `rn`.
    *
    * STORAGE RETENTION (ADVICE r14): the result reads a checkpoint of
    * the full carried row set, held until the caller releases it —
    * `Iterate.releaseCheckpoint(result)` after full consumption,
    * `GraftSession.releaseAll` between harness queries, or session
    * cleanup. Long-lived sessions calling this repeatedly should
    * release explicitly (same contract as `SuffixArray.neighborLcps`).
    */
  def globalRowNumber(df: DataFrame, sortCols: Seq[org.apache.spark.sql.Column],
                      parts: Int = 0): DataFrame = {
    // parts = 0 derives from spark.sql.shuffle.partitions — see
    // SuffixArray.defaultParts (scale-adaptive, local plans unchanged)
    val (_, rn) = SuffixArray.sortedRanking(df, sortCols,
      df.columns.map(col).toSeq, SuffixArray.defaultParts(df, parts))
    rn.drop("_mid")
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
                   parts: Int = 0): DataFrame = {
    val ranged = Iterate.materialize(
      df.repartitionByRange(SuffixArray.defaultParts(df, parts), sortCols: _*)
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

  /** Exact per-group rank-percentiles (element at rank `ceil(n·p)` in
    * ascending `valCol` order) WITHOUT the per-group single-task window
    * trap: `row_number().over(partitionBy(group))` funnels each group —
    * 20M+ rows per flag at TPC-H 100× — into ONE task's sort. This is
    * the classic two-level histogram refinement for exact distributed
    * quantiles:
    *
    *  1. ONE partial-aggregable pass builds a (group, bucket, count)
    *     histogram with fixed-width buckets `floor(val / bucketWidth)` —
    *     its size is bounded by |groups| × valueRange/bucketWidth,
    *     INDEPENDENT of row count; it is collected into one sorted array
    *     per group and the cumulative walk is a row-local fold.
    *  2. For each (group, percentile) the histogram locates the target
    *     bucket and the residual rank within it — a |groups|·|ps|-row
    *     broadcast.
    *  3. A second pass broadcast-joins the input to its target buckets
    *     (keeping ~n/buckets rows per group·percentile), aggregates
    *     per distinct value, and picks the least value whose within-
    *     bucket cumulative count reaches the residual rank — another
    *     row-local fold over the distinct values of ONE bucket
    *     (duplicates already combined map-side: a million repeats of
    *     one hot value are one row). A pathological bucket with millions of DISTINCT
    *     values would want one more refinement level; one level is
    *     right for real numeric columns.
    *
    * Two scans of the input (the TopK-scaladoc trade: cheaper than
    * caching a corpus-sized intermediate), two key-partitioned hash
    * aggregations, no range sampling, no checkpoint, and NO window
    * anywhere in the plan. The rank expression
    * is the same `ceil(n * p)` a SQL row_number oracle computes, so
    * results hash-match the window formulation exactly.
    *
    * `ps` are (outputColumn, fraction) pairs with 0 < fraction ≤ 1.
    */
  def groupRankPercentiles(df: DataFrame, groupCol: String, valCol: String,
                           ps: Seq[(String, Double)],
                           bucketWidth: Double = 64.0): DataFrame = {
    val vType = df.schema(df.schema.fieldIndex(valCol)).dataType
    val bucket = floor(col(valCol) / bucketWidth).cast("long")
    // level 1: bounded histogram, collected per group into ONE sorted
    // array row; the cumulative walk is a row-local `aggregate` fold, so
    // NO window (single-task-per-group or otherwise) appears anywhere in
    // the plan
    val hist = df.groupBy(col(groupCol), bucket.as("_b"))
      .agg(count(lit(1)).as("_cnt"))
      .groupBy(col(groupCol).as("_g"))
      .agg(sort_array(collect_list(struct(col("_b"), col("_cnt")))).as("_h"),
        sum("_cnt").as("_n"))
    // per (group, percentile): target bucket + residual rank = first
    // bucket whose cumulative count reaches rank (rank <= n, so one
    // always exists and the -1 sentinel never survives the fold)
    val targets = hist.select(col("_g"),
        explode(array(ps.map { case (name, p) =>
          val r = ceil(col("_n") * p)
          val found = aggregate(col("_h"),
            struct(lit(0L).as("_cum"), lit(-1L).as("_b"), lit(0L).as("_rr")),
            (acc, x) => {
              val cum2 = (acc("_cum") + x("_cnt")).as("_cum")
              when(acc("_b") >= 0, acc)
                .when(acc("_cum") + x("_cnt") >= r,
                  struct(cum2, x("_b").as("_b"), (r - acc("_cum")).as("_rr")))
                .otherwise(struct(cum2, lit(-1L).as("_b"), lit(0L).as("_rr")))
            })
          struct(lit(name).as("_pn"), found("_b").as("_b"), found("_rr").as("_rr"))
        }: _*)).as("_t"))
      .select(col("_g"), col("_t._pn").as("_pn"), col("_t._b").as("_b"),
        col("_t._rr").as("_rr"))
    // level 2: only rows of target buckets survive the broadcast join
    // (~n/buckets per group-percentile); duplicate values combine
    // map-side in the per-value aggregation, and the within-bucket pick
    // is again a row-local fold over the sorted (value, count) array
    val picked = df.join(broadcast(targets),
        col(groupCol) === col("_g") && bucket === col("_b"))
      .groupBy(col("_g"), col("_pn"), col("_rr"), col(valCol))
      .agg(count(lit(1)).as("_c2"))
      .groupBy(col("_g"), col("_pn"), col("_rr"))
      .agg(sort_array(collect_list(struct(col(valCol).as("_v"), col("_c2")))).as("_vs"))
      .select(col("_g"), col("_pn"),
        aggregate(col("_vs"),
          struct(lit(0L).as("_cum"), lit(null).cast(vType).as("_v")),
          (acc, x) => {
            val cum2 = (acc("_cum") + x("_c2")).as("_cum")
            when(acc("_v").isNotNull, acc)
              .when(acc("_cum") + x("_c2") >= col("_rr"),
                struct(cum2, x("_v").as("_v")))
              .otherwise(struct(cum2, lit(null).cast(vType).as("_v")))
          })("_v").as("_v"))
    val fAggs = ps.map { case (name, _) =>
      min(when(col("_pn") === name, col("_v"))).as(name) }
    picked.groupBy(col("_g"))
      .agg(fAggs.head, fAggs.tail: _*)
      .withColumnRenamed("_g", groupCol)
  }
}
