package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-validation battery (the Deequ/great-expectations shape,
  * engine-side): each rule is a boolean `Column` over one row; a violation
  * is a row where the rule is false OR null (a null predicate means the
  * rule could not be established — that is a violation, not a pass).
  *
  * Scale shape: [[checkRows]] is ONE narrow scan — every rule folds into
  * the same partial aggregate, so 50 rules over 100 TB cost one pass and
  * a single one-row-per-partition shuffle. [[checkFk]] is a broadcast-able
  * anti-join on the parent's distinct keys. Results unpivot to one row per
  * rule `(rule, n_viol, n_rows)` so batteries from several tables union
  * into one report.
  */
object Validate {

  /** Violation counts for row-level rules, one scan. */
  def checkRows(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val aggs = rules.map { case (name, rule) =>
      sum(when(coalesce(rule, lit(false)), 0L).otherwise(1L)).as(s"v_$name")
    } :+ count(lit(1)).as("n_rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map { case (name, _) => s"'$name', v_$name" }
      .mkString(", ")
    wide.select(
      expr(s"stack(${rules.size}, $stackArgs) AS (rule, n_viol)"),
      col("n_rows"))
  }

  /** Referential integrity: child rows whose `childKey` has no match in
    * `parent.parentKey` (null child keys are violations too). One row:
    * `(rule, n_viol, n_rows)`. The parent side collapses to distinct keys
    * before the join — broadcast-sized for dimension tables; for giant
    * parents Spark falls back to a shuffled semi-join on the key.
    */
  def checkFk(rule: String, child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame = {
    val keys = parent.select(col(parentKey).as(childKey)).distinct()
    val viol = child.join(keys, Seq(childKey), "left_anti")
    viol.agg(count(lit(1)).as("n_viol"))
      .crossJoin(child.agg(count(lit(1)).as("n_rows")))
      .select(lit(rule).as("rule"), col("n_viol"), col("n_rows"))
  }
}
