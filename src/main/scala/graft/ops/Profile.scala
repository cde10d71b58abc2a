package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset profiling: per-column null/distinct/min/max statistics in ONE
  * aggregation pass (a single scan regardless of column count — at 100 TB
  * a per-column loop of scans is the difference between one job and N).
  * Output: one row per profiled column.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_cnt_$c"),
        countDistinct(col(c)).as(s"_dst_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val total = count(lit(1)).as("_total")
    val wide = df.agg(total, aggs: _*)
    // one row per column: unpivot the wide single-row aggregate
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        (col("_total") - col(s"_cnt_$c")).as("n_null"),
        col(s"_dst_$c").as("n_distinct"),
        col(s"_min_$c").as("min_val"),
        col(s"_max_$c").as("max_val"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Fixed-width histogram of a numeric column: one partial-aggregating
    * shuffle on the bin id (map-side combine reduces each partition to at
    * most n_bins rows before the exchange — the histogram of 100 TB moves
    * kilobytes). Bin edges are value-derived (`floor(x / width)`), not
    * data-derived, so no extra pass for min/max and bins are stable as
    * data grows.
    */
  def histogram(df: DataFrame, valCol: String, width: Double): DataFrame =
    df.groupBy(floor(col(valCol) / lit(width)).cast("long").as("bin"))
      .agg(count(lit(1)).as("cnt"),
        min(col(valCol)).as("min_val"),
        max(col(valCol)).as("max_val"),
        round(sum(col(valCol)), 2).as("sum_r2"))
}
