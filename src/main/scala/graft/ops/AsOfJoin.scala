package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * `right.ts <= left.ts` within the same key group (ties at equal ts match).
  *
  * Implemented as UNION + WINDOW, not as an inequality join: both sides
  * shuffle once on the key, a single per-key sort by (ts, side) runs
  * `last(value, ignoreNulls)` over the unbounded-preceding frame, and left
  * rows read their carried-forward match. At 100 TB this is one exchange +
  * one sort — the inequality-join formulation would be a per-key range
  * probe at best and a nested loop at worst. (DuckDB expresses the same
  * operator natively as `ASOF JOIN`, which the oracle uses.)
  */
object AsOfJoin {

  /** @param valueCols right-side columns carried to the matched left rows
    *                   (exposed as `asof_<name>`)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
           leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .select(Seq(col(keyCol), col("_ts"), col("_side")) ++
        leftCols.filterNot(_ == keyCol).map(c => col(c)) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val r = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(0))
      .select(Seq(col(keyCol), col("_ts"), col("_side")) ++
        leftCols.filterNot(_ == keyCol).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"_r_$c")): _*)
    // right rows sort before left rows at equal ts → equal-ts rights match
    val w = Window.partitionBy(keyCol)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r)
      .select(col("*") +:
        valueCols.map(c => last(col(s"_r_$c"), ignoreNulls = true).over(w).as(s"asof_$c")): _*)
    val outCols: Seq[Column] = (col(keyCol) +:
      leftCols.filterNot(_ == keyCol).map(c => col(c)).toSeq) ++
      valueCols.map(c => col(s"asof_$c"))
    carried
      .where(col("_side") === 1)
      .select(outCols: _*)
  }
}
