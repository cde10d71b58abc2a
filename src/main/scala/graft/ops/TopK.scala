package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-items (heavy hitters) over an item column — the two-pass
  * exact pattern a 100 TB profile job actually runs:
  *
  *   1. *Candidate pass* (narrow, no shuffle): each partition summarizes
  *      its items with a Misra-Gries sketch of size `k`. Pigeonhole
  *      guarantee: any item with global count > n/(k+1) exceeds
  *      n_p/(k+1) in at least one partition, so the union of the
  *      per-partition candidate sets is a LOSSLESS superset of the global
  *      heavy hitters. The union is bounded by k × partitions rows —
  *      broadcastable no matter how large n is. The same pass carries each
  *      partition's exact row count out as a marker row, so the total `n`
  *      for the threshold costs no extra scan.
  *   2. *Exact pass*: re-scan the columnar source, semi-join against the
  *      broadcast candidate set (narrow — no shuffle of non-candidate
  *      rows), then one hash aggregation over candidate rows only,
  *      filtered by the threshold `cnt·(k+1) > n` in exact integer
  *      arithmetic.
  *
  * The result is EXACT (items and counts), not approximate: the sketch
  * only prunes the candidate space. One wide shuffle total, sized by the
  * candidate row count, never by n — and NOTHING corpus-sized is ever
  * persisted: the only materialized intermediate is the k×partitions
  * sketch output (two cheap scans of the source instead of one cached
  * scan, which at 100 TB is the right trade — a cache of the exploded
  * token stream is O(corpus)).
  */
object TopK {

  /** Top-k rows per group via the custom two-phase physical operator
    * ([[graft.plans.TopKPerGroup]]): map-side bounded heaps prune to ≤ k
    * rows per group per partition BEFORE the exchange — the window
    * formulation shuffles and sorts everything first. `orderCols` are
    * (name, descending) pairs; pass a TOTAL order for deterministic
    * results (ties beyond k drop row_number-style).
    */
  def topKPerGroupExec(df: DataFrame, groupCols: Seq[String],
                       orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
    val lp = df.queryExecution.analyzed
    def attr(n: String) = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${lp.output.map(_.name).mkString(", ")}"))
    val order = orderCols.map { case (c, desc) =>
      SortOrder(attr(c), if (desc) Descending else Ascending) }
    org.apache.spark.sql.GraftDatasetBridge.ofRows(df.sparkSession,
      graft.plans.TopKPerGroup(k, groupCols.map(attr), order, lp))
  }

  /** [[topKPerGroupExec]] plus a 1-based `rankCol` (row_number semantics
    * over `orderCols` within each group), emitted by the final exec at
    * zero extra cost — the emission position after the heap merge IS the
    * rank. Replaces the `row_number().over(...)` re-rank of rows the exec
    * already pruned (an extra shuffle + sort of the pruned output).
    */
  def topKPerGroupExecRanked(df: DataFrame, groupCols: Seq[String],
                             orderCols: Seq[(String, Boolean)], k: Int,
                             rankCol: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Descending, SortOrder}
    import org.apache.spark.sql.types.IntegerType
    val lp = df.queryExecution.analyzed
    def attr(n: String) = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${lp.output.map(_.name).mkString(", ")}"))
    val order = orderCols.map { case (c, desc) =>
      SortOrder(attr(c), if (desc) Descending else Ascending) }
    val rank = AttributeReference(rankCol, IntegerType, nullable = false)()
    org.apache.spark.sql.GraftDatasetBridge.ofRows(df.sparkSession,
      graft.plans.TopKPerGroup(k, groupCols.map(attr), order, lp, Some(rank)))
  }

  /** One Misra-Gries counter-maintenance step: increment a tracked item,
    * admit an untracked one while under capacity, else decrement-all
    * (each decrement is paid for by a prior increment → O(1) amortized).
    * The single copy of the logic carrying the pigeonhole guarantee.
    */
  private def offer(counters: mutable.HashMap[String, Long],
      item: String, k: Int): Unit = {
    if (counters.contains(item)) counters(item) += 1L
    else if (counters.size < k) counters(item) = 1L
    else {
      val dead = mutable.ArrayBuffer.empty[String]
      counters.keysIterator.foreach { key =>
        val next = counters(key) - 1L
        if (next == 0L) dead += key else counters(key) = next
      }
      dead.foreach(counters.remove)
    }
  }

  /** Misra-Gries summary of one iterator: at most `k` surviving candidate
    * rows `(item, 0)`, plus ONE `(null, partitionCount)` marker row
    * carrying the partition's exact row count (summed downstream into the
    * global `n` — no separate counting scan).
    */
  private[graft] def misraGries(it: Iterator[String], k: Int): Iterator[(String, Long)] = {
    val counters = mutable.HashMap.empty[String, Long]
    var n = 0L
    it.foreach { item => n += 1L; offer(counters, item, k) }
    counters.keysIterator.map((_, 0L)).toList.iterator ++ Iterator((null, n))
  }

  /** Per-group Misra-Gries over (group, item) pairs: one MG(k) sketch per
    * group present in the partition, plus one `(grp, null, count)` marker
    * row per group carrying this partition's exact per-group row count.
    */
  private[graft] def misraGriesByGroup(it: Iterator[(String, String)], k: Int)
      : Iterator[(String, String, Long)] = {
    val sketches = mutable.HashMap.empty[String, mutable.HashMap[String, Long]]
    val counts = mutable.HashMap.empty[String, Long]
    it.foreach { case (grp, item) =>
      counts(grp) = counts.getOrElse(grp, 0L) + 1L
      offer(sketches.getOrElseUpdate(grp, mutable.HashMap.empty), item, k)
    }
    (sketches.iterator.flatMap { case (grp, cs) => cs.keysIterator.map((grp, _, 0L)) } ++
      counts.iterator.map { case (grp, n) => (grp, null, n) }).toList.iterator
  }

  /** All items of `itemCol` whose exact count exceeds n/(k+1), with their
    * exact counts: `(item, cnt)`. Deterministic for any partitioning —
    * the sketch only affects which NON-answers are pruned.
    */
  def frequentItems(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    import items.sparkSession.implicits._
    val vals = items.select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)
    // one narrow pass yields BOTH the candidate superset and the exact
    // total; only its k×partitions-bounded output is materialized
    val sketch = Iterate.materialize(
      vals.as[String].mapPartitions(it => misraGries(it, k)).toDF("item", "pn"))
    val candidates = sketch.df.where(col("item").isNotNull).select("item").distinct()
    val total = sketch.df.agg(sum(col("pn")).as("n"))
    val counted = vals // exact pass: re-scan the columnar source
      .join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy("item")
      .agg(count(lit(1)).as("cnt"))
    // exact integer threshold: cnt > n/(k+1)  ⇔  cnt·(k+1) > n
    val result = counted.crossJoin(broadcast(total))
      .where(col("cnt") * lit(k + 1L) > col("n"))
      .select(col("item"), col("cnt"))
      .orderBy(col("cnt").desc, col("item"))
    val out = Iterate.scoped(result)
    sketch.release()
    out
  }

  /** Grouped variant: items whose exact count within their group exceeds
    * n_group/(k+1). Same two-pass shape — the pigeonhole guarantee holds
    * per group over each partition's per-group substream, so the
    * per-partition per-group sketches still yield a lossless candidate
    * superset; per-group totals ride the same pass as marker rows.
    * Candidate and total tables are group-bounded (≤ k×parts rows per
    * group / one row per group per partition) — broadcastable at any n.
    */
  def frequentItemsByGroup(items: DataFrame, groupCol: String,
      itemCol: String, k: Int): DataFrame = {
    import items.sparkSession.implicits._
    val vals = items.select(col(groupCol).cast("string").as("grp"),
        col(itemCol).cast("string").as("item"))
      .where(col("grp").isNotNull && col("item").isNotNull)
    val sketch = Iterate.materialize(
      vals.as[(String, String)].mapPartitions(it => misraGriesByGroup(it, k))
        .toDF("grp", "item", "pn"))
    val candidates = sketch.df.where(col("item").isNotNull)
      .select("grp", "item").distinct()
    val totals = sketch.df.where(col("item").isNull)
      .groupBy("grp").agg(sum(col("pn")).as("n"))
    val counted = vals // exact pass: re-scan the columnar source
      .join(broadcast(candidates), Seq("grp", "item"), "left_semi")
      .groupBy("grp", "item")
      .agg(count(lit(1)).as("cnt"))
    val result = counted.join(broadcast(totals), "grp")
      .where(col("cnt") * lit(k + 1L) > col("n"))
      .select(col("grp"), col("item"), col("cnt"))
      .orderBy(col("grp"), col("cnt").desc, col("item"))
    val out = Iterate.scoped(result)
    sketch.release()
    out
  }
}
