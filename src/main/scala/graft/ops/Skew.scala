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

  /** Salted equi-join for a LOW-CARDINALITY (hence hot-keyed) join key:
    * without salting, a shuffle join on a 3-value key lands the entire
    * fact table on 3 reducers whatever the cluster size. The small side
    * replicates `numSalts`× (it is small — that's the premise); each
    * fact row picks a deterministic salt from a secondary column, so the
    * hot key spreads over `numSalts` reducers and the result is exactly
    * the plain join's. Prefer `broadcast()` when the small side fits —
    * this is the fallback when it doesn't (or the build side must
    * shuffle anyway, e.g. under storage-partitioned constraints).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keyCol: String,
                 saltSource: Column, numSalts: Int = 16): DataFrame = {
    // NULL saltSource must not become a NULL _salt (the inner join on
    // (key, _salt) would silently drop the row, breaking the "exactly the
    // plain join" contract) — default null salts deterministically to 0
    val salted = fact.withColumn("_salt",
      pmod(coalesce(Dedup.md5Int(saltSource.cast("string")), lit(0L)), lit(numSalts)))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    salted.join(replicated, Seq(keyCol, "_salt")).drop("_salt")
  }
}
