package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Frequent-items (heavy hitters) over an item column — the two-pass
  * exact pattern a 100 TB profile job actually runs:
  *
  *   1. *Candidate pass* (narrow, no shuffle): each partition summarizes
  *      its items with a Misra-Gries sketch of size `k`. Pigeonhole
  *      guarantee: any item with global count > n/(k+1) exceeds
  *      n_p/(k+1) in at least one partition, so the union of the
  *      per-partition candidate sets is a LOSSLESS superset of the global
  *      heavy hitters. The union is bounded by k × partitions rows —
  *      broadcastable no matter how large n is.
  *   2. *Exact pass*: semi-join the items against the broadcast candidate
  *      set (narrow again — no shuffle of non-candidate rows), then one
  *      hash aggregation over candidate rows only, filtered by the
  *      threshold `cnt·(k+1) > n` in exact integer arithmetic.
  *
  * The result is EXACT (items and counts), not approximate: the sketch
  * only prunes the candidate space. One wide shuffle total, sized by the
  * candidate row count, never by n.
  */
object TopK {

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

  /** Misra-Gries summary of one iterator: at most `k` surviving keys. */
  private[graft] def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
    val counters = mutable.HashMap.empty[String, Long]
    it.foreach(offer(counters, _, k))
    counters.keysIterator.toList.iterator
  }

  /** Per-group Misra-Gries over (group, item) pairs: one MG(k) sketch per
    * group present in the partition. State is k counters × groups seen in
    * this partition.
    */
  private[graft] def misraGriesByGroup(it: Iterator[(String, String)], k: Int)
      : Iterator[(String, String)] = {
    val sketches = mutable.HashMap.empty[String, mutable.HashMap[String, Long]]
    it.foreach { case (grp, item) =>
      offer(sketches.getOrElseUpdate(grp, mutable.HashMap.empty), item, k)
    }
    sketches.iterator.flatMap { case (grp, cs) => cs.keysIterator.map((grp, _)) }
      .toList.iterator
  }

  /** All items of `itemCol` whose exact count exceeds n/(k+1), with their
    * exact counts: `(item, cnt)`. Deterministic for any partitioning —
    * the sketch only affects which NON-answers are pruned.
    */
  def frequentItems(items: DataFrame, itemCol: String, k: Int): DataFrame = {
    import items.sparkSession.implicits._
    // three consumers (sketch pass, exact pass, total) — Spark shares no
    // common subplans, so persist once; Iterate.scoped releases it
    val vals = items.select(col(itemCol).cast("string").as("item"))
      .where(col("item").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val candidates = vals.as[String]
      .mapPartitions(it => misraGries(it, k))
      .toDF("item")
      .distinct()
    val counted = vals
      .join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy("item")
      .agg(count(lit(1)).as("cnt"))
    // exact integer threshold: cnt > n/(k+1)  ⇔  cnt·(k+1) > n
    val total = vals.agg(count(lit(1)).as("n"))
    val result = counted.crossJoin(broadcast(total))
      .where(col("cnt") * lit(k + 1L) > col("n"))
      .select(col("item"), col("cnt"))
      .orderBy(col("cnt").desc, col("item"))
    Iterate.scoped(result, vals)
  }

  /** Grouped variant: items whose exact count within their group exceeds
    * n_group/(k+1). Same two-pass shape — the pigeonhole guarantee holds
    * per group over each partition's per-group substream, so the
    * per-partition per-group sketches still yield a lossless candidate
    * superset. Candidate and total tables are group-bounded (≤ k×parts
    * rows per group / one row per group) — broadcastable at any n.
    */
  def frequentItemsByGroup(items: DataFrame, groupCol: String,
      itemCol: String, k: Int): DataFrame = {
    import items.sparkSession.implicits._
    val vals = items.select(col(groupCol).cast("string").as("grp"),
        col(itemCol).cast("string").as("item"))
      .where(col("grp").isNotNull && col("item").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val candidates = vals.as[(String, String)]
      .mapPartitions(it => misraGriesByGroup(it, k))
      .toDF("grp", "item")
      .distinct()
    val counted = vals
      .join(broadcast(candidates), Seq("grp", "item"), "left_semi")
      .groupBy("grp", "item")
      .agg(count(lit(1)).as("cnt"))
    val totals = vals.groupBy("grp").agg(count(lit(1)).as("n"))
    val result = counted.join(broadcast(totals), "grp")
      .where(col("cnt") * lit(k + 1L) > col("n"))
      .select(col("grp"), col("item"), col("cnt"))
      .orderBy(col("grp"), col("cnt").desc, col("item"))
    Iterate.scoped(result, vals)
  }
}
