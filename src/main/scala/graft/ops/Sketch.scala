package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate sketches for data profiling at scale (SURVEY.md §7.1
  * adjacent): distinct-count and quantile estimation in one pass over
  * arbitrarily large data, with bounded state per group.
  *
  * Everything here composes Spark's codegen'd sketch aggregates rather
  * than reimplementing them:
  *
  *  - `approx_count_distinct` — HyperLogLog++ (Heule et al., EDBT '13),
  *    state = 2^p 6-bit registers (~1.5 KB at rsd 2%) regardless of
  *    cardinality;
  *  - `hll_sketch_agg`/`hll_union_agg` — Apache DataSketches HLL, whose
  *    sketches are VALUES: persist a sketch column at a fine grain once,
  *    then answer any coarser-grain distinct-count query by unioning
  *    sketches without rescanning the data — the pre-aggregation shape a
  *    100 TB profiling pipeline needs (exact distinct counts cannot be
  *    rolled up: distinct is not distributive);
  *  - `percentile_approx` — Greenwald-Khanna-style rank sketch, rank error
  *    ≤ 1/accuracy, state O(accuracy · log n).
  *
  * Accuracy contracts are tested two ways: tolerance specs against exact
  * results (SketchSpec), and driver queries that emit the exact value
  * plus a within-tolerance flag the DuckDB oracle expects to be 1 — an
  * out-of-tolerance estimate hash-mismatches the oracle.
  */
object Sketch {

  /** Per-group exact distinct count alongside the HLL++ estimate and an
    * in-tolerance flag (`|approx − exact| ≤ tol · exact`). The exact
    * count is for validation harnesses; production profiling at scale
    * drops it and keeps only the O(1)-state estimate.
    */
  def approxDistinct(df: DataFrame, valueCol: String, rsd: Double, tol: Double,
      groupCols: String*): DataFrame =
    // Dedup (group, value) pairs first, then count + sketch the deduped
    // stream: HLL register state is insert-idempotent, so the estimate is
    // identical to sketching the raw stream — but this plan is two plain
    // partial-agg-friendly hash aggregations, where `count_distinct`
    // mixed with a non-distinct aggregate would force an Expand of every
    // input row (measured 3.15s -> 0.6s at sf0.1).
    df.select((groupCols :+ valueCol).map(col): _*).distinct()
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(col(valueCol)).as("exact_distinct"),
        approx_count_distinct(valueCol, rsd).as("approx_distinct"))
      .withColumn("approx_ok",
        (abs(col("approx_distinct") - col("exact_distinct")) <=
          col("exact_distinct") * tol).cast("int"))

  /** Build DataSketches HLL sketches at a fine grain — one binary sketch
    * value per fine group. `lgK` trades size for error (2^lgK registers;
    * lgK 12 ≈ 1.6% standard error). The result is a materializable
    * profile table: any coarser rollup is [[rollupDistinct]] over it.
    */
  def hllProfile(df: DataFrame, valueCol: String, lgK: Int, fineCols: String*): DataFrame =
    df.groupBy(fineCols.map(col): _*)
      .agg(expr(s"hll_sketch_agg($valueCol, $lgK)").as("hll_sketch"))

  /** Roll a sketch profile up to a coarser grain by unioning sketches —
    * no rescan of the base data. `approx_distinct` is a BIGINT (Spark's
    * `hll_sketch_estimate` rounds the raw estimator).
    */
  def rollupDistinct(profile: DataFrame, coarseCols: String*): DataFrame =
    profile.groupBy(coarseCols.map(col): _*)
      .agg(expr("hll_sketch_estimate(hll_union_agg(hll_sketch))").as("approx_distinct"))

  /** Per-group approximate quantiles (rank error ≤ 1/accuracy) for the
    * given probabilities, as an array column `approx_q`.
    */
  def approxQuantiles(df: DataFrame, valueCol: String, probs: Seq[Double],
      accuracy: Int, groupCols: String*): DataFrame = {
    val probsSql = probs.mkString("array(", ", ", ")")
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile_approx($valueCol, $probsSql, $accuracy)").as("approx_q"))
  }

  /** `|approx − exact| ≤ tol · |exact|` as an int flag column. */
  def withinTol(approx: Column, exact: Column, tol: Double): Column =
    (abs(approx - exact) <= abs(exact) * tol).cast("int")

  // ------------------------------------------------------------ theta

  /** Apache DataSketches THETA sketches — the set-OPERATION sketch
    * family. HLL unions but cannot intersect; theta sketches support
    * union, intersection, and difference, so "users who did A ∩ B" over
    * 100 TB needs no exact sets. Build is per-partition: one
    * `UpdateSketch` per group in a map, so only compact sketch bytes
    * (≤ ~2^lgK · 8 B) cross the exchange per (partition × group); the
    * group-level merge is a byte-level Union aggregator. Below 2^lgK
    * distinct values a theta sketch is in exact mode — estimates are
    * exact integers (what the fixture scales exercise); above, the
    * relative error is ~1/√(2^lgK).
    */
  def thetaProfile(df: DataFrame, valueCol: String, groupCol: String,
                   lgK: Int = 12): DataFrame = {
    import org.apache.datasketches.theta.UpdateSketch
    val spark = df.sparkSession
    import spark.implicits._
    val built = df
      .select(col(groupCol).cast("string"), col(valueCol).cast("string"))
      .as[(String, String)]
      .mapPartitions { it =>
        val sk = scala.collection.mutable.HashMap.empty[String, UpdateSketch]
        it.foreach { case (g, v) =>
          if (v != null)
            sk.getOrElseUpdate(g,
              UpdateSketch.builder().setLogNominalEntries(lgK).build()).update(v)
        }
        sk.iterator.map { case (g, s) => (g, s.compact().toByteArray) }
      }
      .toDF(groupCol, "_sk")
    built.groupBy(groupCol)
      .agg(udaf(new ThetaUnionAgg(lgK)).apply(col("_sk")).as("theta"))
  }

  private def wrapTheta(b: Array[Byte]) =
    org.apache.datasketches.theta.Sketches.wrapSketch(
      org.apache.datasketches.memory.Memory.wrap(b))

  /** Byte-level theta Union aggregator (commutative/associative). */
  class ThetaUnionAgg(lgK: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    import org.apache.datasketches.theta.SetOperation
    private def union2(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
        u.union(wrapTheta(a))
        u.union(wrapTheta(b))
        u.getResult.toByteArray
      }
    def zero: Array[Byte] = Array.empty
    def reduce(buf: Array[Byte], in: Array[Byte]): Array[Byte] = union2(buf, in)
    def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = union2(a, b)
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder = org.apache.spark.sql.Encoders.BINARY
    def outputEncoder = org.apache.spark.sql.Encoders.BINARY
  }

  /** Set-operation estimates over two sketch-byte columns. Scala UDFs by
    * necessity (no built-in theta SQL surface) — but they run on
    * POST-AGGREGATION rows (one per group pair), never on the data path,
    * so codegen on the scan is untouched.
    */
  def thetaIntersectEst(a: Column, b: Column): Column = {
    val f = udf { (x: Array[Byte], y: Array[Byte]) =>
      val i = org.apache.datasketches.theta.SetOperation.builder().buildIntersection()
      i.intersect(wrapTheta(x)); i.intersect(wrapTheta(y))
      math.round(i.getResult.getEstimate)
    }
    f(a, b)
  }

  def thetaUnionEst(a: Column, b: Column): Column = {
    val f = udf { (x: Array[Byte], y: Array[Byte]) =>
      val u = org.apache.datasketches.theta.SetOperation.builder().buildUnion()
      u.union(wrapTheta(x)); u.union(wrapTheta(y))
      math.round(u.getResult.getEstimate)
    }
    f(a, b)
  }

  /** |A ∖ B| estimate. */
  def thetaDiffEst(a: Column, b: Column): Column = {
    val f = udf { (x: Array[Byte], y: Array[Byte]) =>
      val d = org.apache.datasketches.theta.SetOperation.builder().buildANotB()
      math.round(d.aNotB(wrapTheta(x), wrapTheta(y)).getEstimate)
    }
    f(a, b)
  }

  // ------------------------------------------------------------ count-min

  /** Hash of an item for count-min row `row` (salted md5 — portable,
    * deterministic, no stored seed).
    */
  private def cmsBucket(item: Column, row: Column, w: Int): Column =
    pmod(Dedup.md5Int(concat(row.cast("string"), lit(":"), item.cast("string"))),
      lit(w.toLong))

  /** Count-min sketch (Cormode & Muthukrishnan '05) of item frequencies,
    * as a SPARSE counter table `(row, bucket, cnt)` with `d` rows of `w`
    * buckets. Never overcounts by more than `εN` (ε = e/w) with
    * probability `1 − e^−d`, never undercounts at all.
    *
    * The table is a VALUE like the HLL profile sketches: counters are
    * linear, so sketches of two corpora merge by unioning tables and
    * re-summing `(row, bucket)` — frequency profiling that rolls up
    * without rescanning. Build is one explode (×d) plus one
    * partial-aggregating shuffle bounded by d·w rows per partition —
    * the sketch of 100 TB of tokens still moves at most d·w counters
    * per partition through the exchange.
    */
  def cmsBuild(df: DataFrame, valueCol: String, w: Int = 16384, d: Int = 4): DataFrame =
    df.select(col(valueCol).cast("string").as("_v"))
      .where(col("_v").isNotNull)
      .select(col("_v"), explode(sequence(lit(0), lit(d - 1))).as("row"))
      .select(col("row"), cmsBucket(col("_v"), col("row"), w).as("bucket"))
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))

  /** Count-min sketch from PRE-AGGREGATED (item, weight) rows — identical
    * counters to [[cmsBuild]] over the raw occurrences (the CMS update is
    * `counter += 1` per occurrence, which sums to `counter += weight`).
    * Use when an exact per-item count table already exists in the plan:
    * the expensive raw scan (tokenize + explode) then happens ONCE and
    * the sketch derives from the small distinct-item frame instead of a
    * second pass over the corpus.
    */
  def cmsBuildWeighted(df: DataFrame, valueCol: String, weightCol: String,
                       w: Int = 16384, d: Int = 4): DataFrame =
    df.select(col(valueCol).cast("string").as("_v"),
        col(weightCol).cast("long").as("_wt"))
      .where(col("_v").isNotNull)
      .select(col("_v"), col("_wt"), explode(sequence(lit(0), lit(d - 1))).as("row"))
      .select(col("row"), cmsBucket(col("_v"), col("row"), w).as("bucket"), col("_wt"))
      .groupBy("row", "bucket").agg(sum("_wt").as("cnt"))

  /** Merge count-min sketches built with the same (w, d): counters add. */
  def cmsMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionAll _)
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))

  /** Point-frequency estimates for `items`: min over the d row counters
    * (0 where a bucket row is absent — the sparse encoding of an empty
    * counter). The sketch side is at most d·w rows → broadcast join.
    */
  def cmsEstimate(cms: DataFrame, items: DataFrame, itemCol: String,
                  w: Int = 16384, d: Int = 4): DataFrame =
    items.select(col(itemCol), explode(sequence(lit(0), lit(d - 1))).as("row"))
      .withColumn("bucket", cmsBucket(col(itemCol), col("row"), w))
      .join(broadcast(cms), Seq("row", "bucket"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
}
