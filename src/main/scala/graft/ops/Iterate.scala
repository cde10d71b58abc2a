package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialization helper for iterative DataFrame algorithms (label
  * propagation, k-means): each round must (1) compute eagerly, (2) restart
  * the logical plan from the computed result — otherwise the plan tree
  * doubles every round and analysis time explodes — and (3) release the
  * previous round's storage so memory stays O(1) in the iteration count.
  *
  * Unlike `localCheckpoint(eager = true)` (round-1 design), nothing here
  * pins blocks non-fault-tolerantly: with a checkpoint directory configured
  * the data goes through a reliable `checkpoint()` (survives executor
  * loss); otherwise it is cached MEMORY_AND_DISK and recovery replays the
  * retained RDD lineage.
  */
object Iterate {

  /** A materialized round: `df` is the lineage-cut frame to build the next
    * round on; `unpersist()` frees its predecessor-round storage hook.
    */
  final case class Materialized(df: DataFrame, private val handle: Option[DataFrame]) {
    def unpersist(): Unit = handle.foreach(_.unpersist())
  }

  /** Run one action over `df` (completing any `observe` metrics attached to
    * it) and return a frame whose logical plan starts at the computed
    * result.
    */
  def materialize(df: DataFrame): Materialized = {
    val spark = df.sparkSession
    if (spark.sparkContext.getCheckpointDir.isDefined) {
      // reliable checkpoint: eager, fault-tolerant, truncates RDD lineage
      Materialized(df.checkpoint(), None)
    } else {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      p.count()
      // LogicalRDD leaf over the cached result: constant-size plans across
      // rounds; the RDD lineage (not the logical plan) handles recovery
      Materialized(spark.createDataFrame(p.rdd, p.schema), Some(p))
    }
  }
}
