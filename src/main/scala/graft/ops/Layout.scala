package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data layout for multi-dimensional pruning: Z-order (Morton)
  * clustering. Sorting a table by the bit-interleaving of two columns
  * places rows that are close in BOTH dimensions into the same files, so
  * parquet min/max statistics prune a 2-D range predicate to a handful of
  * files — the technique behind OPTIMIZE ZORDER in lakehouse table
  * formats, expressed here as plain columnar arithmetic.
  *
  * The z-value is pure shifts/masks (codegen'd, constant-folded loop
  * unrolled at plan build), so it is deterministic and oracle-mirrorable.
  * Layout is a WRITE-side concern: `zOrderWrite`-style usage is
  * `df.repartitionByRange(n, zValue(...)).sortWithinPartitions(zValue(...))
  * .write...` — range partitioning keeps file count stable and each file
  * covers a compact z-range (= a small rectangle in value space).
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative integer
    * columns: bit i of `a` lands at position 2i, bit i of `b` at 2i+1.
    * Callers bucket unbounded/skewed values first (e.g. `ntile` or a
    * fixed-width bucket) so the low bits carry signal.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Cluster `df` for 2-D pruning on (a, b): range-partition then sort by
    * the z-value.
    */
  def zOrder(df: DataFrame, a: Column, b: Column, partitions: Int,
      bits: Int = 16): DataFrame = {
    val z = zValue(a, b, bits)
    df.repartitionByRange(partitions, z).sortWithinPartitions(z)
  }

  /** Deterministic training-shard layout: every row gets a shard id and a
    * position within its shard, both pure functions of the row KEY and
    * the shard count — the reproducible global shuffle a training run
    * wants ("shuffle once, stream forever": epoch order is pinned by the
    * dataset + shard count alone, identical on every rerun and engine,
    * no RNG state to persist). Shard = stable md5 hash of the key mod
    * `shards` (the [[Sampling]] hash family — uncorrelated with any data
    * column, so shards are balanced and i.i.d.-like); within-shard order
    * = the same hash with the key as tiebreak, i.e. a hash-random
    * permutation, NOT insertion or key order (adjacent source documents
    * land far apart — the decorrelation batch gradients assume).
    *
    * The per-shard `row_number` window is safe at scale because its
    * partitions are the hash-balanced shards themselves (≈|rows|/shards
    * each); writers then `partitionBy(shard)` + sort by `pos` to lay
    * files out in exactly this order. Returns the input plus
    * (`shard`, `pos`).
    */
  def shardAssignment(df: DataFrame, keyCol: String, shards: Int): DataFrame = {
    val h = expr(s"md5_long(CAST($keyCol AS STRING), 8)")
    df.withColumn("_h", h)
      .withColumn("shard", pmod(col("_h"), lit(shards.toLong)))
      .withColumn("pos", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("_h"), col(keyCol))))
      .drop("_h")
  }

  /** Output-file hygiene: write `df` as ~`filesWanted` files of bounded
    * row count, ordered by `orderCol` so each file covers a compact key
    * range (min/max prunable). Small-file storms (one file per task ×
    * thousands of tasks) and giant unsplittable files are both output
    * killers at 100 TB; range repartition + `maxRecordsPerFile` bounds
    * both directions.
    */
  def sizedWrite(df: DataFrame, path: String, orderCol: Column,
      filesWanted: Int, maxRowsPerFile: Long): Unit =
    df.repartitionByRange(filesWanted, orderCol)
      .sortWithinPartitions(orderCol)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRowsPerFile)
      .parquet(path)
}
