package graft.ingest

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Table sinks (K1/K2/K4 in SURVEY.md §2.1) plus the reference's progress
  * counters (A3) as `observe()` metrics.
  *
  * The reference drops + re-creates its target collection, bulk-inserts in
  * batches of 100, and recovers from duplicate keys row-by-row. Here the
  * merge happens *before* the write (A4), so the sink is a plain
  * overwrite-mode parquet write: batching, buffering, and atomicity are the
  * writer's job; `_id` uniqueness holds by construction.
  */
object Sinks {

  case class WriteReport(rows: Long, badRows: Long, path: String)

  /** K1+K2: overwrite the `fast` table, partitioned by `type` — at scale
    * the 8 type partitions give partition-pruned reads for the dominant
    * "lookup by type" access path. Returns observed counters (A3): rows
    * written and bad rows dropped (P5 guard).
    */
  def writeFast(docs: DataFrame, path: String): WriteReport = {
    val obs = Observation("fast_write")
    val good = docs.where(col("fast").isNotNull)
      .observe(obs, count(lit(1)).as("rows"),
        count(when(col("prefLabel").isNull, 1)).as("missing_pref"))
    good.write.mode("overwrite").partitionBy("type").parquet(path)
    WriteReport(obs.get("rows").asInstanceOf[Long], 0L, path)
  }

  /** K4: overwrite the updated viaf table. */
  def writeViaf(viaf: DataFrame, path: String): WriteReport = {
    val obs = Observation("viaf_write")
    val observed = viaf.observe(obs, count(lit(1)).as("rows"))
    observed.write.mode("overwrite").parquet(path)
    WriteReport(obs.get("rows").asInstanceOf[Long], 0L, path)
  }

  def readTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed + sorted managed table: joins between two tables bucketed on
    * the same key with the same bucket count run WITHOUT a shuffle on
    * either side (co-located sort-merge join) — the pre-partitioning story
    * for repeated large-table joins at 100 TB. Requires `saveAsTable`
    * (bucketing metadata lives in the session catalog).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Default bucket count for [[mergeInto]] tables — same sizing rule as
    * [[graft.streaming.StreamingIngest.DefaultBuckets]]: at deploy pick
    * ~table_size / target_partition_size; merge cost scales with touched
    * buckets, so more buckets = finer-grained rewrites.
    */
  val MergeBuckets = 64

  /** Generic MERGE INTO over the hash-bucket parquet layout — the
    * deploy-shaped upsert API for the reference's lookup-update path
    * (`lib/ingest.js:134-165` recovers from duplicate-key inserts
    * row-by-row; here the merge is declarative and partition-bounded).
    * Semantics are SQL MERGE with whole-row actions:
    *
    *   - `WHEN MATCHED THEN UPDATE SET *`   (update row replaces stored)
    *   - `WHEN NOT MATCHED THEN INSERT *`
    *   - `WHEN MATCHED AND <deleteCol> THEN DELETE`   (when given)
    *
    * The table is stored partitioned by `_bucket = pmod(xxhash64(key),
    * numBuckets)` — a pure function of the merge key, so a row can never
    * move between partitions and a batch touches ONLY the buckets its
    * keys hash into: the stored side is scanned partition-pruned (a
    * broadcast semi-join on the touched-bucket list), rewritten under
    * `partitionOverwriteMode=dynamic`, and every untouched partition's
    * files stay byte-identical (SinksSpec asserts this). Per-batch work
    * is O(batch + touched buckets), not O(table). Replay-idempotent:
    * re-merging an already-applied batch reproduces the same table
    * content, so an at-least-once upstream (a streaming foreachBatch
    * retry) converges.
    *
    * On a lakehouse deploy this call maps 1:1 onto Delta/Iceberg
    * `MERGE INTO target USING updates ON target.key = updates.key ...` —
    * the bucket layout is exactly what their file-skipping on the merge
    * key does, minus the transaction log (single-writer here; the
    * materialize-before-overwrite below is what the log would otherwise
    * guarantee).
    *
    * `updates` must carry at most one row per key (pre-aggregate
    * conflicts upstream — [[graft.streaming.StreamingIngest.mergeBatch]]
    * shows the domain-specific fold); `numBuckets` must match the value
    * the table was created with.
    */
  def mergeInto(spark: SparkSession, targetPath: String, updates: DataFrame,
                keyCol: String, numBuckets: Int = MergeBuckets,
                deleteCol: Option[String] = None): Unit = {
    val bucket = pmod(xxhash64(col(keyCol)), lit(numBuckets.toLong)).cast("int")
    val upserts0 = deleteCol.fold(updates)(d => updates.where(!coalesce(col(d), lit(false))))
    val upserts = deleteCol.fold(upserts0)(d => upserts0.drop(d))
      .withColumn("_bucket", bucket)
    val allKeys = updates.select(col(keyCol)).withColumn("_bucket", bucket)
    // The touched-bucket list drives both the stored-side partition prune
    // and the post-write empty-bucket cleanup, so it is brought to the
    // driver ONCE, through an observe() metric on a one-column pass over
    // the batch — the list is bounded by `numBuckets` (a layout constant,
    // 64 by default), never by data size, so this is a counters-class
    // driver value, not a data collect.
    val touchedBuckets: Seq[Int] = {
      val obs = Observation()
      allKeys.select("_bucket")
        .observe(obs, collect_set(col("_bucket")).as("bs"))
        .foreach(_ => ())
      obs.get("bs").asInstanceOf[scala.collection.Seq[Any]]
        .map(_.asInstanceOf[Int]).toSeq.sorted
    }
    // explicit existence check, NOT a catch-all around the read: an
    // EXISTING but unreadable table must fail the merge loudly — treating
    // it as "new" would overwrite the table with just this batch
    val existing = {
      val p = new org.apache.hadoop.fs.Path(targetPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) Some(spark.read.parquet(targetPath)) else None
    }
    val merged = existing match {
      case Some(prev) =>
        // stored rows of touched buckets only (literal IN over the
        // partition column — statically partition-pruned at the scan),
        // minus every matched key (updated keys re-enter from the batch
        // side; deleted keys don't)
        prev.where(col("_bucket").isin(touchedBuckets: _*))
          .join(allKeys.select(keyCol), Seq(keyCol), "left_anti")
          .unionByName(upserts)
      case None => upserts
    }
    // the dynamic overwrite must not read its own output mid-write —
    // materialize fully first (same discipline as StreamingIngest); the
    // materializing action also completes the present-bucket observation
    val presentObs = Observation()
    val m = graft.ops.Iterate.materialize(
      merged.observe(presentObs, collect_set(col("_bucket")).as("bs")))
    try {
      m.df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_bucket")
        .parquet(targetPath)
      // Dynamic partition overwrite only rewrites partitions PRESENT in
      // the written data — a touched bucket whose merged output is empty
      // (the batch deleted every stored row and no upsert hashed there)
      // keeps its old files and the deleted keys would silently
      // resurrect. Delete those now-empty partition directories
      // explicitly, AFTER the write commits (pre-deleting would lose the
      // overwrite's crash-safety: old files must survive until the new
      // commit lands; a crash in the window before this cleanup leaves
      // stale rows that the next replay of the batch removes again —
      // at-least-once delivery still converges).
      val present = presentObs.get("bs").asInstanceOf[scala.collection.Seq[Any]]
        .map(_.asInstanceOf[Int]).toSet
      val emptied = touchedBuckets.filterNot(present)
      if (emptied.nonEmpty) {
        val fs = new org.apache.hadoop.fs.Path(targetPath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        emptied.foreach { b =>
          val dir = new org.apache.hadoop.fs.Path(targetPath, s"_bucket=$b")
          if (fs.exists(dir)) fs.delete(dir, true)
        }
      }
    } finally m.release()
  }

  /** Read back a [[mergeInto]] table without its layout column. */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("_bucket")
}
