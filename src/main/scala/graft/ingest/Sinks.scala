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
}
