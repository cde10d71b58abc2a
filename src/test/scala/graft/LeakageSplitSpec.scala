package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Sampling}

/** The property split_leakage_safe exists for: hashing the near-dup
  * CLUSTER id means no near-dup pair can straddle a split boundary —
  * while the naive doc-id split demonstrably leaks on the same pairs.
  */
class LeakageSplitSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private lazy val pairs = Dedup.minhashCandidates(
    Dedup.minhashSignature(docs, "text", "doc_id"), "doc_id", threshold = 0.25)

  private def straddles(split: org.apache.spark.sql.DataFrame): Long = {
    val s = split.select(col("doc_id"), col("split"))
    pairs
      .join(s.withColumnsRenamed(Map("doc_id" -> "a_id", "split" -> "a_split")), "a_id")
      .join(s.withColumnsRenamed(Map("doc_id" -> "b_id", "split" -> "b_split")), "b_id")
      .where(col("a_split") =!= col("b_split"))
      .count()
  }

  test("cluster-keyed split: zero near-dup pairs straddle; doc-keyed leaks") {
    val cc = Dedup.connectedComponents(pairs, "a_id", "b_id")
      .withColumnsRenamed(Map("node" -> "doc_id"))
    val withCluster = docs.select(col("doc_id")).join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    val safe = Sampling.trainValTestSplit(withCluster, "cluster_id")
    val naive = Sampling.trainValTestSplit(docs.select("doc_id"), "doc_id")
    val nPairs = pairs.count()
    val leakNaive = straddles(naive)
    info(s"pairs=$nPairs, naive split straddles=$leakNaive")
    assert(nPairs > 0, "fixture produced no near-dup pairs — spec is vacuous")
    assert(straddles(safe) == 0L)
    assert(leakNaive > 0L,
      "naive split straddled nothing — contrast case lost its teeth")
  }
}
