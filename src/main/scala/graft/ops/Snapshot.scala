package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot lifecycle operators — the table-maintenance side of a data
  * platform: what changed between two snapshots, how to keep attribute
  * history (SCD type 2), and how to compact a change log to current
  * state. All are single-shuffle key-partitioned joins/windows; none
  * keeps per-key state beyond one row.
  */
object Snapshot {

  /** Full-outer diff of two snapshots on a key: one row per key with
    * `a_*`/`b_*` attribute pairs and a `status` of added / removed /
    * changed / unchanged. Null-safe comparison (`<=>`): a null-to-value
    * attribute transition counts as changed, not as a match.
    */
  def diff(a: DataFrame, b: DataFrame, keyCols: Seq[String],
           compareCols: Seq[String]): DataFrame = {
    def pick(df: DataFrame, prefix: String): DataFrame =
      compareCols.foldLeft(df.select((keyCols ++ compareCols).map(col): _*)) {
        (d, c) => d.withColumnRenamed(c, s"$prefix$c")
      }
    val j = pick(a, "a_").withColumn("_a", lit(1))
      .join(pick(b, "b_").withColumn("_b", lit(1)), keyCols, "full_outer")
    val changed = compareCols.map(c => !(col(s"a_$c") <=> col(s"b_$c")))
      .reduce(_ || _)
    j.withColumn("status",
        when(col("_a").isNull, "added")
          .when(col("_b").isNull, "removed")
          .when(changed, "changed")
          .otherwise("unchanged"))
      .drop("_a", "_b")
  }

  /** Apply one update batch to a slowly-changing-dimension type-2 history
    * table. `current` carries `valid_from`/`valid_to` BIGINT columns
    * (null `valid_to` = open row); `updates` carries the key, the same
    * attribute columns, and a BIGINT `tsCol`. Open rows whose attributes
    * differ from their update are closed at the update timestamp and a
    * new open version is appended; new keys open their first version;
    * no-op updates (identical attributes) leave the open row untouched.
    * Closed history always passes through unchanged.
    *
    * One full-outer join of OPEN rows against the batch (both sides
    * keyed — closed history never shuffles), then unions. At deploy
    * scale the same plan runs as MERGE INTO on a table format.
    *
    * Precondition: at most ONE update row per key per batch (the SCD2
    * contract — intra-batch versions have no defined order here). Fold a
    * multi-version feed with [[latest]] first.
    */
  def scd2Apply(current: DataFrame, updates: DataFrame, keyCols: Seq[String],
                compareCols: Seq[String], tsCol: String): DataFrame = {
    val outCols = (keyCols ++ compareCols ++ Seq("valid_from", "valid_to")).map(col)
    val open = current.where(col("valid_to").isNull)
    val closed = current.where(col("valid_to").isNotNull)
    val u = compareCols.foldLeft(updates)((d, c) => d.withColumnRenamed(c, s"u_$c"))
      .withColumnRenamed(tsCol, "_uts")
    val j = open.withColumn("_o", lit(1))
      .join(u.withColumn("_u", lit(1)), keyCols, "full_outer")
    val hasO = col("_o").isNotNull
    val hasU = col("_u").isNotNull
    val differs = compareCols.map(c => !(col(c) <=> col(s"u_$c"))).reduce(_ || _)
    val keepOpen = j.where(hasO && (!hasU || !differs)).select(outCols: _*)
    val closedNow = j.where(hasO && hasU && differs)
      .select((keyCols ++ compareCols).map(col) ++
        Seq(col("valid_from"), col("_uts").as("valid_to")): _*)
    val newOpen = j.where(hasU && (!hasO || differs))
      .select(keyCols.map(col) ++ compareCols.map(c => col(s"u_$c").as(c)) ++
        Seq(col("_uts").as("valid_from"),
          lit(null).cast("bigint").as("valid_to")): _*)
    closed.select(outCols: _*)
      .unionByName(keepOpen).unionByName(closedNow).unionByName(newOpen)
  }

  /** Change-log compaction: the latest row per key under a total order
    * (CDC "last write wins"). `orderBy` must fully determine a winner
    * (include a unique tiebreaker — see NOTES.md fact 3).
    */
  def latest(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column]): DataFrame =
    df.withColumn("_rn", row_number().over(
        Window.partitionBy(keyCols.map(col): _*).orderBy(orderBy: _*)))
      .where(col("_rn") === 1)
      .drop("_rn")
}
