package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Dedup

/** Streaming incremental near-duplicate detection: each micro-batch of
  * documents is MinHash-signed and checked against the persisted corpus
  * band/signature table via [[Dedup.incrementalMinhashDups]] — the
  * continuous-ingest complement of the batch self-join
  * ([[Dedup.minhashCandidates]]). No corpus rescan, no self-join: the
  * batch is broadcast against the stored signatures, and the batch's own
  * signatures are appended so later batches see earlier ones.
  *
  * Exactly-once by layout: BOTH sinks (the duplicate-pair log and the
  * signature store) are partitioned by `_batch` and written with dynamic
  * partition overwrite, so a replayed micro-batch (foreachBatch retries
  * after a crash between the two writes) rewrites ITS OWN partition to
  * the same bytes and touches nothing else — idempotent without a
  * transactional table format (StreamingSpec pins both properties).
  *
  * Within-batch duplicates are also caught (the batch self-join is tiny
  * by construction): a pair (a < b) inside one batch is emitted as
  * `in_id = b, stored_id = a` — the lower id plays "already stored",
  * matching how the pair would have split across two batches.
  *
  * Output schema: (in_id, stored_id, est_jaccard, _batch).
  */
object StreamingDedup {

  /** Per-batch merge body — also the direct entry for batch replay tests.
    * Seeding the corpus = calling this with the seed frame and batchId -1
    * (or any reserved id) before starting the stream.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                   textCol: String, idCol: String,
                   sigPath: String, outPath: String,
                   numHashes: Int = 8, bandSize: Int = 2,
                   threshold: Double = 0.5): Unit = {
    val inSig = Dedup.minhashSignature(batch, textCol, idCol, numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // a replayed batch must not see its OWN partially-written signatures
      // (it would self-match every doc) — the stored side excludes this
      // batch id, which also makes the read replay-stable.
      // Only a MISSING store (first batch ever) means "no stored corpus";
      // any other read failure (transient FS error, corrupt footer) must
      // propagate and fail the micro-batch so the stream retries —
      // swallowing it would silently drop every cross-batch pair for this
      // batch, permanently (its signatures still get appended below).
      // Path(...).getFileSystem handles raw filesystem paths (spaces and
      // other URI-reserved characters) that java.net.URI would reject.
      val fs = new org.apache.hadoop.fs.Path(sigPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val stored =
        if (fs.exists(new org.apache.hadoop.fs.Path(sigPath)))
          Some(spark.read.parquet(sigPath)
            .where(col("_batch") =!= lit(batchId)).drop("_batch"))
        else None
      val within = Dedup.minhashCandidates(inSig, idCol, numHashes, bandSize, threshold)
        .select(col("b_id").as("in_id"), col("a_id").as("stored_id"),
          col("est_jaccard"))
      val cross = stored.map(s =>
          Dedup.incrementalMinhashDups(s, inSig, idCol, numHashes, bandSize, threshold))
        .getOrElse(within.limit(0))
      val dups = cross.unionByName(within).withColumn("_batch", lit(batchId))
      writeBatchPartition(dups, outPath)
      writeBatchPartition(inSig.withColumn("_batch", lit(batchId)), sigPath)
    } finally {
      inSig.unpersist()
      ()
    }
  }

  /** Dynamic overwrite of exactly this frame's `_batch` partitions —
    * replaying a batch rewrites its own directory, nothing else.
    */
  private def writeBatchPartition(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch")
      .parquet(path)

  /** Start the stream: any streaming docs frame (with `textCol`, `idCol`)
    * → per-batch incremental dedup against `sigPath`, duplicate pairs
    * appended under `outPath`. `Trigger.AvailableNow` drains what exists
    * and stops — the test/cron shape; pass a processing-time trigger for
    * a long-running deploy.
    */
  def start(docs: DataFrame, textCol: String, idCol: String,
            sigPath: String, outPath: String, checkpoint: String,
            numHashes: Int = 8, bandSize: Int = 2,
            threshold: Double = 0.5): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, batchId, textCol, idCol,
          sigPath, outPath, numHashes, bandSize, threshold)
      }
      .start()
}
