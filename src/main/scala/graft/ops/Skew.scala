package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling aggregation patterns (SURVEY.md §4 physical-execution
  * notes).
  *
  * Spark's hash aggregation already does map-side partial aggregation for
  * algebraic aggregates (count/sum/min/max), so those don't need manual
  * salting. The real skew hazard at 100 TB is *holistic* per-group state —
  * `collect_set`/`collect_list` on a hot key concentrates one giant array
  * in a single task. Salting splits the hot group across `numSalts`
  * sub-groups (phase 1), then merges the per-salt sets (phase 2): no task
  * ever materializes more than ~1/numSalts of a hot group's input, and the
  * phase-2 input is already de-duplicated per salt.
  */
object Skew {

  /** Two-phase salted collect_set: returns (keyCol, `values` ARRAY sorted).
    * The salt is derived from the collected value (deterministic, no RNG
    * state), so identical values land on the same salt and de-duplicate in
    * phase 1 — phase 2 merges disjoint-ish sorted sets.
    */
  def saltedCollectSet(df: DataFrame, keyCol: String, valCol: Column,
                       numSalts: Int = 16): DataFrame =
    df.select(col(keyCol), valCol.as("_v"))
      .withColumn("_salt", pmod(hash(col("_v")), lit(numSalts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(collect_set(col("_v")).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sort_array(array_distinct(flatten(collect_list(col("_partial")))))
        .as("values"))
}
