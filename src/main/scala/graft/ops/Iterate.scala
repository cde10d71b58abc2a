package graft.ops

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Materialization helper for iterative DataFrame algorithms (label
  * propagation, k-means): each round must (1) compute eagerly, (2) restart
  * the logical plan from the computed result — otherwise the plan tree
  * doubles every round and analysis time explodes — and (3) release the
  * previous round's storage so memory stays O(1) in the iteration count.
  *
  * Local sessions (`sparkContext.isLocal`) take `localCheckpoint` — one
  * job into executor storage; a reliable checkpoint's durability claim is
  * vacuous in a single JVM, so its second job + file write per round is
  * pure overhead there. Cluster sessions keep the reliable path below.
  * Override either way with `spark.graft.iterate.localCheckpoint`
  * ([[graft.GraftSession.withJobScopedCheckpoint]] forces the reliable
  * path for the scope of a job that asks for durable rounds).
  *
  * With a checkpoint directory configured ([[graft.GraftSession]]`.local`
  * sets one; cluster deploys that build their own session must call
  * `sparkContext.setCheckpointDir` — see [[scoped]]) the data goes through
  * a reliable `checkpoint()`: eager, fault-tolerant (survives executor
  * loss), lineage-truncating, and — critically — downstream stages read
  * InternalRows straight from the checkpoint files, with none of the
  * InternalRow→Row→InternalRow re-encode that the cache-based fallback
  * pays via `createDataFrame`. [[Materialized.release]] deletes the
  * round's checkpoint files deterministically, so disk stays O(1) in the
  * iteration count too (belt-and-braces:
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` is also set so
  * GC reclaims anything a caller forgets).
  *
  * Without a checkpoint dir the frame is cached MEMORY_AND_DISK and
  * recovery replays the retained RDD lineage.
  */
object Iterate {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Round-count threshold below which iterative ops SKIP per-round
    * checkpoints and chain rounds lazily instead (lazy persists where a
    * round's state has more than one consumer): the caller's single final
    * action is then the only job, and plan depth stays bounded by the
    * threshold. Above it, ops cut lineage with [[materialize]] every
    * [[LazyRounds]] rounds (or every round where convergence must be read
    * per round) so analysis time stays linear in the iteration count.
    * Rationale: a checkpoint per round costs a full write + read of the
    * state at every round — the right trade at unbounded depth, pure
    * overhead for a 3-round query (round-7 bench: 2.6–4.2 s toy-scale
    * graph queries whose work was sub-second).
    */
  val LazyRounds = 4

  /** A materialized round: `df` is the lineage-cut frame to build the next
    * round on; [[release]] frees its storage. Named `release` (not
    * `unpersist`) because on the checkpoint path it is DESTRUCTIVE: it
    * deletes the checkpoint files, so any action on `df` (including a
    * straggler or retried consumer stage) after release() fails with
    * FileNotFoundException instead of recomputing. Like
    * [[releaseCheckpoint]], the deletion is whole-tree: every materialized
    * input embedded in `df`'s plan is destroyed, including ones shared
    * with sibling frames. Call it only once the NEXT round (or the final
    * consumer) has itself materialized — i.e. after the action that
    * builds the successor frame has returned. Idempotent: a second call
    * is a no-op.
    */
  final case class Materialized(df: DataFrame, private val releaseFn: () => Unit) {
    private val released = new AtomicBoolean(false)
    def release(): Unit = if (released.compareAndSet(false, true)) releaseFn()
  }

  /** Should rounds use `localCheckpoint` instead of a reliable checkpoint?
    * Default: yes exactly when the master is local — in a single JVM
    * "survives executor loss" is vacuous (driver death loses everything
    * either way), so the reliable path's second job + checkpoint-file
    * write per round is pure overhead. A cluster session keeps the
    * reliable default; either side can force the choice via
    * `spark.graft.iterate.localCheckpoint=true|false`.
    */
  private def useLocalCheckpoint(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.getOption("spark.graft.iterate.localCheckpoint")
      .map(_.toBoolean)
      .getOrElse(spark.sparkContext.isLocal)

  /** Run one action over `df` (completing any `observe` metrics attached to
    * it) and return a frame whose logical plan starts at the computed
    * result.
    */
  def materialize(df: DataFrame): Materialized = {
    val spark = df.sparkSession
    if (useLocalCheckpoint(spark)) {
      // one job: materializes into executor storage, truncates both the
      // logical plan and the RDD lineage, serves InternalRows directly
      val cp = df.localCheckpoint()
      Materialized(cp, () => deleteCheckpoint(cp))
    } else if (spark.sparkContext.getCheckpointDir.isDefined) {
      // reliable checkpoint: eager, fault-tolerant (survives executor
      // loss), truncates RDD lineage, serves InternalRows directly (no
      // Row re-encode); two jobs, shuffle map stages reused between them
      val cp = df.checkpoint()
      Materialized(cp, () => deleteCheckpoint(cp))
    } else {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      p.count()
      // LogicalRDD leaf over the cached result: constant-size plans across
      // rounds; the RDD lineage (not the logical plan) handles recovery
      Materialized(spark.createDataFrame(p.rdd, p.schema), () => { p.unpersist(); () })
    }
  }


  /** Scoped-cache pattern for library ops that persist an intermediate
    * consumed by several branches of one result plan: materialize `result`
    * (reliable checkpoint), then release the intermediates — the returned
    * frame reads from the checkpoint, so freeing the upstream caches is
    * safe and no *cache* outlives the op. Note this makes the op EAGER:
    * the full query runs (and its result is written to checkpoint storage)
    * at call time, and failures surface here rather than at the caller's
    * first action.
    *
    * Checkpoint-file lifetime: the returned frame reads the files, so they
    * cannot be deleted here. They are reclaimed (a) deterministically, if
    * the caller passes the frame to [[releaseCheckpoint]] once done with
    * it, (b) by the ContextCleaner when the RDD is GC'd
    * (`cleanCheckpoints=true`), or (c) with the checkpoint dir itself
    * (`GraftSession.local` uses a temp dir removed on JVM exit; a cluster
    * deploy should point `setCheckpointDir` at a job-scoped path it
    * cleans up).
    *
    * Only `GraftSession.local` sets a checkpoint dir; a session built via
    * `GraftSession.builder()` (the cluster path) must call
    * `sparkContext.setCheckpointDir` itself. Without one, the caches are
    * kept (releasing them would force the caller's first action to
    * recompute the whole lineage), a warning is logged, and the session's
    * `clearCache()` remains the cleanup.
    *
    * The intermediates are unpersisted even if the checkpoint fails.
    */
  def scoped(result: DataFrame, cached: DataFrame*): DataFrame =
    if (useLocalCheckpoint(result.sparkSession)) {
      try result.localCheckpoint()
      finally cached.foreach(_.unpersist())
    } else if (result.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      try result.checkpoint()
      finally cached.foreach(_.unpersist())
    } else {
      log.warn("Iterate.scoped: no checkpoint dir configured — intermediate " +
        "caches stay persisted until spark.catalog.clearCache(); call " +
        "sparkContext.setCheckpointDir for leak-free library ops")
      result
    }

  /** Deterministically delete the checkpoint files backing a frame returned
    * by [[scoped]] (or [[Materialized]]`.df`). DESTRUCTIVE, and WHOLE-TREE:
    * every materialized input embedded anywhere in the frame's plan is
    * destroyed (checkpoint files deleted, blocks unpersisted), not just the
    * frame's own root checkpoint — so releasing a frame derived from a
    * shared materialized input also kills sibling frames reading that
    * input. Call only once ALL consumers of every embedded checkpoint have
    * fully materialized (e.g. after the sink write returns). No-op for
    * frames that are not checkpoint-backed.
    */
  def releaseCheckpoint(df: DataFrame): Unit = deleteCheckpoint(df)

  // Note on eager `Dataset.checkpoint()` cost: it runs two jobs (the
  // materializing count, then the checkpoint write, which recomputes from
  // lineage) — but shuffle map stages are REUSED between them (skipped
  // stages via MapOutputTracker), so the second job only re-executes the
  // final post-shuffle stage. Persisting before checkpointing to "avoid
  // the double compute" was measured SLOWER here (columnar cache
  // build/read on the full output costs more than re-running one stage):
  // dedup_clusters 4.0s bare vs 8.3s persist-first at sf0.1.

  private def deleteCheckpoint(df: DataFrame): Unit =
    // traverse the whole tree: a materialized frame is often returned
    // through a final projection/sort, so the LogicalRDD is rarely the
    // root (e.g. pageRank's `.select("node", "rank")` over its state)
    df.queryExecution.analyzed.collect { case lr: LogicalRDD => lr }
      .foreach { lr =>
        lr.rdd.getCheckpointFile.foreach { f =>
          val p = new Path(f)
          val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
          fs.delete(p, true)
          ()
        }
        // local-checkpoint frames keep no files; their storage is the
        // persisted blocks (no-op for reliable-checkpoint RDDs)
        lr.rdd.unpersist()
        ()
      }
}
