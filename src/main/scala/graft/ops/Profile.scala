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
    // null/min/max ride ONE plain single-pass aggregate. The distinct
    // counts deliberately do NOT join them there as countDistinct aggs:
    // k countDistincts in one agg plan through Expand — every input row
    // replicated k+1 times before the exchange. Instead the values
    // unpivot to (column, value-string) rows and dedup through a
    // standard partial-aggregable two-level agg: k× the rows moved, but
    // map-side combine collapses them to per-partition distincts first
    // (casting to string keeps distinctness: numeric→string is
    // canonical and injective).
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"_cnt_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val total = count(lit(1)).as("_total")
    val wide = df.agg(total, aggs: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        (col("_total") - col(s"_cnt_$c")).as("n_null"),
        col(s"_min_$c").as("min_val"),
        col(s"_max_$c").as("max_val"))
    }
    val base = wide.select(explode(array(rows: _*)).as("p")).select("p.*")
    // string-cast is injective under SQL value-equality EXCEPT for ±0.0
    // on floating types ('-0.0' vs '0.0' but -0.0 = 0.0): add +0 there so
    // both stringify as '0.0', matching countDistinct / a COUNT(DISTINCT)
    // oracle
    def canon(c: String) = df.schema(c).dataType match {
      case org.apache.spark.sql.types.DoubleType |
           org.apache.spark.sql.types.FloatType => (col(c) + lit(0)).cast("string")
      case _ => col(c).cast("string")
    }
    val distincts = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), canon(c).as("v"))): _*)).as("u"))
      .select("u.*")
      .where(col("v").isNotNull)
      .groupBy("column", "v").agg(count(lit(1)).as("_one"))
      .groupBy("column").agg(count(lit(1)).as("n_distinct"))
    base.join(distincts, Seq("column"), "left")
      .select(col("column"), col("n_null"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_val"), col("max_val"))
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
