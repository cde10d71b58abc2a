package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training pipelines.
  *
  * All selection is hash-based (md5 of a key column), never RNG-based:
  * the same row lands in the same sample/split on every run, on every
  * cluster size, with no seed state to coordinate across 1000 executors —
  * and the oracle can reproduce the selection exactly. Selection is a
  * narrow `filter` on the scan (no shuffle, pushdown-friendly).
  */
object Sampling {

  /** Hash bucket in [0, 100) for percentage-based selection. */
  def pctBucket(key: Column): Column =
    pmod(Dedup.md5Int(key.cast("string")), lit(100))

  /** Deterministic ~pct% sample by key hash. */
  def sample(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.where(pctBucket(col(keyCol)) < pct)

  /** Stratified deterministic sample: per-stratum percentage map.
    * Strata not in the map are excluded.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       pctByStratum: Map[String, Int]): DataFrame = {
    val rate = pctByStratum.foldLeft(lit(0)) { case (acc, (s, p)) =>
      when(col(stratumCol) === s, p).otherwise(acc)
    }
    df.where(pctBucket(col(keyCol)) < rate)
  }

  /** Train/validation/test assignment by hash range (e.g. 80/10/10).
    * Adds a `split` column; the row set is unchanged.
    */
  def trainValTestSplit(df: DataFrame, keyCol: String,
                        trainPct: Int = 80, valPct: Int = 10): DataFrame =
    df.withColumn("split",
      when(pctBucket(col(keyCol)) < trainPct, "train")
        .when(pctBucket(col(keyCol)) < trainPct + valPct, "val")
        .otherwise("test"))

  /** Deterministic weighted sample without replacement (Efraimidis &
    * Spirakis '06 exponential race): each row gets key `−ln(u) / w` with
    * `u ∈ (0,1]` hash-derived from the row key, and the k smallest keys
    * win — inclusion probability proportional to weight, no RNG state,
    * reproducible on any cluster. One top-k (`TakeOrderedAndProject`),
    * never a global sort of the corpus.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int): DataFrame = {
    val u = (Dedup.md5Int(concat(lit("ws:"), col(keyCol).cast("string"))) + lit(1L))
      .cast("double") / lit(4294967296.0)
    // Efraimidis-Spirakis assumes w > 0: w < 0 flips the key's sign (those
    // rows would sort FIRST), w = 0 can yield 0/0 = NaN. Rows with
    // non-positive weight have zero inclusion probability by definition —
    // enforce that, don't corrupt the race.
    df.where(col(weightCol).cast("double") > 0)
      .withColumn("_ekey", -log(u) / col(weightCol).cast("double"))
      .orderBy(col("_ekey"), col(keyCol))
      .limit(k)
      .drop("_ekey")
  }

  /** Deterministic k-fold assignment for cross-validation: adds a `fold`
    * column in [0, k) from the key hash. Folds are stable across runs,
    * cluster sizes, and row order — fold i's contents never depend on
    * which executor saw the row — and any fold is selectable later with
    * a plain pushdown-friendly filter (no materialized fold tables).
    */
  def kFold(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.withColumn("fold", pmod(Dedup.md5Int(col(keyCol).cast("string")), lit(k)))

  /** Greedy k-center coreset (Gonzalez '85 farthest-point traversal —
    * a 2-approximation of the optimal covering radius): start from the
    * minimum id, then k−1 times add the point FARTHEST from the chosen
    * set (exact integer squared L2 over an int-quantized vector column;
    * ties break to the smaller id). The diverse-subset selection step a
    * curation pipeline runs when it can afford k passes — unlike
    * hash/temperature sampling it guarantees every point is within the
    * final covering radius of a kept exemplar.
    *
    * Scale shape: the working state is ONE narrow row per point
    * (id, vector, best-distance-so-far), re-materialized per round with
    * the previous round's storage released; each round updates `best`
    * against the single new center (a one-row broadcast subquery — the
    * argmax rides a `max(struct(best, -id))` aggregation, never a
    * collect) and the whole round is ONE job. Rounds = k by
    * construction — the k passes are the algorithm, not an
    * implementation artifact.
    *
    * Output: (rank, idCol, sel_d2) — selection order and the max-min
    * squared distance at selection (sel_d2 of rank r+1 is the covering
    * radius of the first r centers; rank 1 seeds at 0). Up to k rows:
    * selection STOPS once the covering radius reaches 0 (fewer distinct
    * vectors than k) — continuing would re-emit the seed as a duplicate
    * exemplar.
    */
  def kCenterCoreset(df: DataFrame, idCol: String, qCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"k-center needs k >= 1, got $k")
    def d2(a: String, b: String): Column = expr(
      s"aggregate(zip_with($a, $b, (x, y) -> CAST(x - y AS BIGINT) * (x - y)), 0L, (acc, v) -> acc + v)")
    val pts = df.select(col(idCol).cast("long").as("_id"), col(qCol).as("_q"))
    val seed = pts.agg(min("_id").as("_cid"))
    val c1 = pts.join(broadcast(seed), col("_id") === col("_cid"))
      .select(col("_cid"), col("_q").as("_cq"), lit(1L).as("rank"),
        lit(0L).as("sel_d2"))
    // each selected-center row is materialized (one tiny row) BEFORE the
    // state it derives from is released — a lazy center row would hold
    // lineage into an already-unpersisted round checkpoint. The state
    // materializations carry max(_best) as an observe() metric: that IS
    // the next selection's covering radius, so the radius-0 stop costs
    // no extra job in either path.
    val centerRows = scala.collection.mutable.ArrayBuffer(
      Iterate.materialize(c1))
    val obs0 = org.apache.spark.sql.Observation()
    var state = Iterate.materialize(
      pts.crossJoin(broadcast(centerRows.head.df.select(col("_cq"))))
        .select(col("_id"), col("_q"), d2("_q", "_cq").as("_best"))
        .observe(obs0, coalesce(max("_best"), lit(0L)).as("radius")))
    var radius = obs0.get("radius").asInstanceOf[Long]
    var r = 2
    // covering radius 0 ⟹ every point coincides with a chosen center: a
    // further "farthest" point would just re-select the seed (the
    // max(struct) tie rule lands on the global min id), emitting the
    // same exemplar twice — stop with fewer than k rows instead
    while (r <= k && radius > 0) {
      val nxt = state.df
        .agg(max(struct(col("_best"), (-col("_id")).as("_nid"))).as("_m"))
        .select(col("_m._best").as("sel_d2"), (-col("_m._nid")).as("_cid"))
      val cRow = Iterate.materialize(
        state.df.join(broadcast(nxt), col("_id") === col("_cid"))
          .select(col("_cid"), col("_q").as("_cq"), lit(r.toLong).as("rank"),
            col("sel_d2")))
      centerRows += cRow
      if (r < k) {
        val obs = org.apache.spark.sql.Observation()
        val nextState = Iterate.materialize(
          state.df.crossJoin(broadcast(cRow.df.select(col("_cq"))))
            .select(col("_id"), col("_q"),
              least(col("_best"), d2("_q", "_cq")).as("_best"))
            .observe(obs, coalesce(max("_best"), lit(0L)).as("radius")))
        state.release()
        state = nextState
        radius = obs.get("radius").asInstanceOf[Long]
      }
      r += 1
    }
    val out = Iterate.materialize(
      centerRows.map(_.df).reduce(_ unionByName _)
        .select(col("rank"), col("_cid").as(idCol), col("sel_d2")))
    state.release()
    centerRows.foreach(_.release())
    out.df
  }

  /** Per-group cap: keep at most `cap` rows per `groupCol` value — the
    * standard "no domain may dominate the corpus" curation step. Row
    * choice is a deterministic hash rank (tie-broken by the key itself),
    * not arrival order, so the kept set is stable across runs and
    * partitionings. One shuffle on the group key; the per-group window
    * state is a row counter, never the group's rows.
    */
  def cappedPerGroup(df: DataFrame, groupCol: String, keyCol: String,
                     cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(Dedup.md5Int60(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= cap)
      .drop("_rk")
  }
}
