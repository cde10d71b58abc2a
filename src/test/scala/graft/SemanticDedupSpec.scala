package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** SemDeDup (`Similarity.semanticDedup`) laws on handcrafted 2-d vectors
  * where every cosine is known by construction: keep-low-centroid-sim
  * within a duplicate pair, id tie-break on equal centroid similarity,
  * cluster-locality (near-identical vectors in DIFFERENT clusters are
  * never a pair — the deliberate approximation that makes the op linear
  * in cluster population, not corpus), and clique collapse to the single
  * minimum-(cent_cos, id) member.
  */
class SemanticDedupSpec extends SparkSpec {

  import spark.implicits._

  private def cents2d: DataFrame =
    Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
      .toDF("c_id", "c_emb")

  private def run(rows: Seq[(Long, Array[Float])], threshold: Double)
      : Map[Long, (Long, Int)] =
    Similarity.semanticDedup(rows.toDF("vec_id", "embedding"), cents2d,
        "vec_id", "embedding", "c_id", "c_emb", threshold)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(3))))
      .toMap

  test("keep-low-centroid-sim: the pair member closer to the centroid drops") {
    // a sits exactly on centroid 0 (cent_cos 1.0); b is a near-duplicate
    // of a but farther from the centroid — a drops, b survives. d is in
    // the same cluster but below threshold — untouched.
    val out = run(Seq(
      10L -> Array(1f, 0f),      // cent_cos 1.0      — dropped (dup of 11)
      11L -> Array(0.9f, 0.1f),  // cent_cos ~0.9939  — kept (the low one)
      12L -> Array(0.6f, 0.5f)), // cos vs both < τ   — kept
      threshold = 0.95)
    assert(out(10L) == ((0L, 1)))
    assert(out(11L) == ((0L, 0)))
    assert(out(12L) == ((0L, 0)))
  }

  test("equal centroid similarity breaks ties toward the smaller id") {
    val out = run(Seq(
      20L -> Array(0.9f, 0.1f),
      21L -> Array(0.9f, 0.1f)), // identical twin, larger id — drops
      threshold = 0.95)
    assert(out(20L)._2 == 0)
    assert(out(21L)._2 == 1)
  }

  test("near-identical vectors across a cluster boundary are never a pair") {
    // mutual cosine ≈ 0.9999 but they straddle the 45° Voronoi boundary:
    // SemDeDup by design only prunes within a cluster.
    val out = run(Seq(
      30L -> Array(0.71f, 0.70f), // cluster 0
      31L -> Array(0.70f, 0.71f)), // cluster 1
      threshold = 0.95)
    assert(out(30L) == ((0L, 0)))
    assert(out(31L) == ((1L, 0)))
  }

  test("incremental: batch dups flag against stored and earlier-batch rows only") {
    val stored = Seq(
      1L -> Array(1f, 0f),        // cluster 0
      2L -> Array(0.1f, 0.9f))    // cluster 1
      .toDF("vec_id", "embedding")
    val batch = Seq(
      10L -> Array(0.95f, 0.05f), // dup of stored 1 (same cluster, cos high)
      11L -> Array(0.95f, 0.05f), // dup of stored 1 AND earlier-batch 10 → min id 1
      12L -> Array(0.55f, 0.5f))  // cluster 0, below threshold vs everything
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedupIncremental(stored, batch, cents2d,
        "vec_id", "embedding", "c_id", "c_emb", threshold = 0.95)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Long]), r.getInt(3)))).toMap
    assert(out.keySet == Set(10L, 11L, 12L)) // stored rows never re-judged
    assert(out(10L) == ((Some(1L), 1)))
    assert(out(11L) == ((Some(1L), 1)))
    assert(out(12L) == ((None, 0)))
  }

  test("incremental: in-batch twins with no stored match keep the first") {
    val stored = Seq(1L -> Array(0.1f, 0.9f)).toDF("vec_id", "embedding")
    val batch = Seq(
      20L -> Array(0.9f, 0.1f),
      21L -> Array(0.9f, 0.1f))
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedupIncremental(stored, batch, cents2d,
        "vec_id", "embedding", "c_id", "c_emb", threshold = 0.95)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Long]), r.getInt(3)))).toMap
    assert(out(20L) == ((None, 0)))
    assert(out(21L) == ((Some(20L), 1)))
  }

  test("an identical clique collapses to its minimum-id member") {
    val out = run(Seq(
      40L -> Array(1f, 0f),
      41L -> Array(1f, 0f),
      42L -> Array(1f, 0f)),
      threshold = 0.95)
    assert(out(40L)._2 == 0)
    assert(out(41L)._2 == 1)
    assert(out(42L)._2 == 1)
  }
}
