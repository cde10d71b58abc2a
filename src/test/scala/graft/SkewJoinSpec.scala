package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Proof that the LSH band join's documented skew story actually engages:
  * a boilerplate-heavy corpus concentrates one band key per band (every
  * copy of the boilerplate produces the identical MinHash signature, so
  * identical band keys), and AQE's skew-join handling must split those
  * hot partitions rather than serialize them onto one task. The spec
  * lowers the skew thresholds to make toy-scale bytes look like
  * production-scale skew — the RULE under test is the same one that runs
  * at 100 TB, where a hot boilerplate band key is the norm, not the edge
  * case.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot boilerplate band key in minhashCandidates") {
    val tuned = Map(
      // force a shuffle join (broadcast would hide the skew machinery)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // enough partitions that the handful of hot band keys stand clear of
      // the median — with 4 partitions every one holds a hot key and no
      // partition ever exceeds factor x median
      "spark.sql.shuffle.partitions" -> "64",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // toy bytes must register as skew: threshold far below the hot
      // partition's size, advisory size small so the split fans out
      // hot band rows are near-identical and compress brutally in shuffle
      // blocks — thresholds must sit below COMPRESSED sizes
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "512b",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512b",
      // the band join's output feeds a distinct (its own exchange), so
      // splitting the join cannot be "free" — allow the extra shuffle
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val boiler = "all rights reserved contact us terms of service privacy policy cookie settings"
      val docs = ((1 to 1500).map(i => (i.toLong, boiler)) ++
        (1501 to 2000).map(i => (i.toLong,
          s"unique document $i about topic ${i * 7} with extra words ${i * 13} and ${i * 29}")))
        .toDF("doc_id", "text")
      // materialized signature table — the deploy shape (signatures are
      // stored once and reused; see incrementalMinhashDups). Probing
      // showed Spark's OptimizeSkewedJoin declines when the band exchange
      // sits over the full unmaterialized signature pipeline, and engages
      // over a materialized input — documented on minhashCandidates.
      val sig = Dedup.minhashSignature(docs, "text", "doc_id").persist()
      sig.count()
      val cand = Dedup.minhashCandidates(sig, "doc_id")
      // toRdd.count() executes cand's OWN QueryExecution (so the adaptive
      // plan inspected below is the final one) without collecting the
      // ~1.1M-pair clique to the driver
      val n = cand.queryExecution.toRdd.count()
      // all 1500 boilerplate copies pair up (identical signatures)
      assert(n >= 1500L * 1499 / 2, s"expected the full boilerplate clique, got $n")
      // the FINAL adaptive plan must show the skewed sort-merge join —
      // i.e. OptimizeSkewedJoin fired and the hot band partitions were
      // split across tasks instead of landing on one
      val plan = cand.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew-join did not engage on the band join:\n${plan.take(4000)}")
    } finally {
      spark.catalog.clearCache()
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
