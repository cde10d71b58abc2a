package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join, both directions:
  *  - backward ([[asOf]]): for each left row, the most recent right row
  *    with `right.ts <= left.ts` in the same key group;
  *  - forward ([[asOfForward]]): the earliest right row with
  *    `right.ts >= left.ts` (pandas `merge_asof(direction='forward')`).
  * Ties at equal ts match in both directions.
  *
  * Implemented as UNION + WINDOW, not as an inequality join: both sides
  * shuffle once on the key, a single per-key sort by (ts, side) runs
  * `last`/`first(value, ignoreNulls)` over a one-sided frame, and left
  * rows read their carried match. At 100 TB this is one exchange + one
  * sort — the inequality-join formulation would be a per-key range probe
  * at best and a nested loop at worst. (DuckDB expresses the same
  * operator natively as `ASOF JOIN`; the direction is the inequality in
  * its ON clause, which the oracles use.)
  */
object AsOfJoin {

  /** Backward as-of (most recent right at or before the left ts).
    * @param valueCols right-side columns carried to the matched left rows
    *                  (exposed as `asof_<name>`)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
           leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame =
    directed(left, right, keyCol, leftTs, rightTs, valueCols, forward = false)

  /** Forward as-of (earliest right at or after the left ts). */
  def asOfForward(left: DataFrame, right: DataFrame, keyCol: String,
                  leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame =
    directed(left, right, keyCol, leftTs, rightTs, valueCols, forward = true)

  private def directed(left: DataFrame, right: DataFrame, keyCol: String,
                       leftTs: String, rightTs: String, valueCols: Seq[String],
                       forward: Boolean): DataFrame = {
    val leftCols = left.columns
    // sort places the qualifying right rows on the frame side of the left
    // row, equal-ts rights included: backward → rights first (side 0 < 1),
    // frame [unbounded preceding, current] + last; forward → rights after
    // (side 1 > 0), frame [current, unbounded following] + first.
    val (leftSide, rightSide) = if (forward) (0, 1) else (1, 0)
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(leftSide))
      .select(Seq(col(keyCol), col("_ts"), col("_side")) ++
        leftCols.filterNot(_ == keyCol).map(c => col(c)) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val r = right
      .withColumn("_ts", col(rightTs))
      .withColumn("_side", lit(rightSide))
      .select(Seq(col(keyCol), col("_ts"), col("_side")) ++
        leftCols.filterNot(_ == keyCol).map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"_r_$c")): _*)
    val w0 = Window.partitionBy(keyCol).orderBy(col("_ts"), col("_side"))
    val w = if (forward) w0.rowsBetween(0, Window.unboundedFollowing)
            else w0.rowsBetween(Window.unboundedPreceding, 0)
    def pick(c: String): Column =
      if (forward) first(col(s"_r_$c"), ignoreNulls = true).over(w)
      else last(col(s"_r_$c"), ignoreNulls = true).over(w)
    val carried = l.unionByName(r)
      .select(col("*") +: valueCols.map(c => pick(c).as(s"asof_$c")): _*)
    val outCols: Seq[Column] = (col(keyCol) +:
      leftCols.filterNot(_ == keyCol).map(c => col(c)).toSeq) ++
      valueCols.map(c => col(s"asof_$c"))
    carried
      .where(col("_side") === leftSide)
      .select(outCols: _*)
  }
}
