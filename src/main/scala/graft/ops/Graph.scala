package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph analytics beyond duplicate clustering ([[Dedup.connectedComponents]]):
  * PageRank over an edge list, as pure DataFrame rounds.
  *
  * Each round is two key-partitioned shuffles — ranks joined to edges on
  * `src`, contributions aggregated on `dst` — plus a broadcast of the
  * single-row dangling-mass aggregate; a round costs the same at any
  * graph size and AQE's skew handling covers hub nodes. Rounds are
  * lineage-cut through [[Iterate.materialize]] (reliable checkpoint when
  * a checkpoint dir is configured), storage released per round — the
  * same iteration discipline as connected components.
  *
  * Dangling nodes (no out-edges) redistribute their rank mass uniformly,
  * so total rank is conserved at 1.0 every round (asserted in specs, not
  * silently drifting).
  */
object Graph {

  /** Ranks after `iterations` rounds of damped PageRank: `(node, rank)`.
    * Deterministic given the edge list up to float aggregation order —
    * specs compare with tolerance rather than hashes (same policy as
    * sphericalKMeans).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = Iterate.materialize(nodes.withColumn("rank", lit(1.0 / n)))
    var i = 0
    while (i < iterations) {
      val withDeg = ranks.df
        .join(outDeg.withColumnRenamed("src", "node"), Seq("node"), "left")
      // per-edge contributions from non-dangling nodes
      val inbound = withDeg.where(col("deg").isNotNull)
        .select(col("node").as("src"), (col("rank") / col("deg")).as("share"))
        .join(e, "src")
        .groupBy("dst")
        .agg(sum("share").as("inbound"))
      // dangling mass as a one-row broadcast, not a per-round action
      val dangling = withDeg.where(col("deg").isNull)
        .agg(coalesce(sum("rank"), lit(0.0)).as("dmass"))
      val next = nodes
        .join(inbound.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("inbound"), lit(0.0)) +
              col("dmass") / n)).as("rank"))
      val materialized = Iterate.materialize(next)
      ranks.release()
      ranks = materialized
      i += 1
    }
    val out = ranks.df
    e.unpersist(); nodes.unpersist(); outDeg.unpersist()
    out
  }
}
