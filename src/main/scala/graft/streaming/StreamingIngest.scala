package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.ingest.FastIngest

/** Streaming variant of the ingest job: watch a directory for NT files,
  * parse/project incrementally, and merge each micro-batch into the
  * persisted `fast` table via `foreachBatch` (read-union-merge-overwrite —
  * at deploy scale this becomes a MERGE INTO on a table format with
  * upserts; the merge semantics are identical to the batch A4 path).
  *
  * The per-id aggregation runs inside the batch; cross-batch duplicates
  * are resolved by the same deterministic merge the batch job uses, so
  * arrivals in any file order converge to the same table.
  */
object StreamingIngest {

  /** Merge a batch of enriched docs into the stored fast table. */
  def mergeBatch(spark: SparkSession, docs: DataFrame, tablePath: String): Unit = {
    val existing =
      try Some(spark.read.parquet(tablePath)) catch { case _: Exception => None }
    val unioned = existing match {
      case Some(prev) => prev.unionByName(docs)
      case None => docs
    }
    // keep the richer doc per _id (same total order as MergeFastDocs),
    // then set-union the arrays of all contributors
    val merged = unioned
      .groupBy("_id")
      .agg(
        max_by(col("fast"), richness).as("fast"),
        max_by(col("type"), richness).as("type"),
        max_by(col("prefLabel"), richness).as("bestPref"),
        min(col("prefLabel")).as("fillPref"),
        sort_array(array_distinct(flatten(collect_list(col("altLabel"))))).as("altLabel"),
        sort_array(array_distinct(flatten(collect_list(col("sameAsLc"))))).as("sameAsLc"),
        sort_array(array_distinct(flatten(collect_list(col("sameAsViaf"))))).as("sameAsViaf"),
        sort_array(array_distinct(flatten(collect_list(col("normalized"))))).as("normalized"))
      .select(col("_id"), col("fast"), col("type"),
        coalesce(col("bestPref"), col("fillPref")).as("prefLabel"),
        col("altLabel"), col("sameAsLc"), col("sameAsViaf"), col("normalized"))
    // overwrite must not read from its own output mid-write → materialize
    val rows = merged.localCheckpoint(true)
    rows.write.mode("overwrite").parquet(tablePath)
  }

  /** Richness key mirroring [[graft.ingest.MergeFastDocs.richness]]. */
  private def richness = struct(
    coalesce(length(col("prefLabel")), lit(0)) + coalesce(length(col("type")), lit(0)) +
      coalesce(expr("aggregate(transform(altLabel, x -> length(x)), 0, (a, v) -> a + v)"), lit(0)) +
      coalesce(expr("aggregate(transform(sameAsLc, x -> length(x)), 0, (a, v) -> a + v)"), lit(0)) +
      coalesce(expr("aggregate(transform(sameAsViaf, x -> length(x)), 0, (a, v) -> a + v)"), lit(0)) +
      coalesce(expr("aggregate(transform(normalized, x -> length(x)), 0, (a, v) -> a + v)"), lit(0)),
    col("type"), col("prefLabel"))

  /** Start the streaming job over a directory of NT files. */
  def start(spark: SparkSession, inputDir: String, tablePath: String,
            docType: String, checkpointDir: String): StreamingQuery = {
    val lines = spark.readStream
      .option("maxFilesPerTrigger", 8)
      .text(inputDir)
      .withColumnRenamed("value", "line")
    val fragments = FastIngest.project(FastIngest.parse(lines))
    fragments.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val docs = FastIngest.buildDocs(batch, lit(docType))
        mergeBatch(spark, docs, tablePath)
      }
      .start()
  }
}
