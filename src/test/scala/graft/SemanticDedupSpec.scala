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

  test("deploy path: kmeans-fed dedup on the real fixture satisfies the drop invariants") {
    // the shipped oracle query pins seed centroids; the deploy path feeds
    // sphericalKMeans centroids. Properties that must hold regardless of
    // centroid quality: (1) every cluster keeps >= 1 member — in
    // particular the minimum-(cent_cos, id) member never drops; (2) every
    // dropped row has a same-cluster keep-priority partner at >= threshold
    // (the partner may itself be dropped further down a priority chain —
    // the EXISTS rule is the paper's greedy semantics, not transitive-
    // closure dedup); (3) row count is preserved.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.sphericalKMeansCentroids(
      emb, "vec_id", "embedding", k = 8, iterations = 2)
    val out = Similarity.semanticDedup(emb, cents, "vec_id", "embedding",
      "c_id", "c_emb", threshold = 0.5)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.length == emb.count())
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cl, members) =>
      assert(members.exists(_._4 == 0), s"cluster $cl dropped every member")
      val best = members.minBy(m => (m._3, m._1))
      assert(best._4 == 0, s"cluster $cl dropped its minimum member ${best._1}")
    }
    // verify property (2) against an in-memory cosine check
    val vecs = emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    rows.filter(_._4 == 1).foreach { case (id, cl, cc, _) =>
      val partner = byCluster(cl).exists { case (pid, _, pcc, _) =>
        pid != id && cos(vecs(id), vecs(pid)) >= 0.5 &&
          (pcc < cc || (pcc == cc && pid < id))
      }
      assert(partner, s"dropped $id has no keep-priority partner at threshold")
    }
  }

  test("retract: removing every better duplicate REINSTATES a dropped row; " +
      "untouched cells pass through verbatim") {
    // cluster 0: 10 (cent_cos 1.0, dropped by 11), 11 (kept), 12 (below τ)
    // cluster 1: 20/21 near-dups (20 dropped by 21 — id tie-break domain)
    val rows = Seq(
      10L -> Array(1f, 0f),
      11L -> Array(0.9f, 0.1f),
      12L -> Array(0.6f, 0.5f),
      20L -> Array(0f, 1f),
      21L -> Array(0.1f, 0.9f))
    val df = rows.toDF("vec_id", "embedding")
    val state = Similarity.semanticDedupState(df, cents2d, "vec_id",
      "embedding", "c_id", "c_emb", threshold = 0.95)
    assert(state.where(col("vec_id") === 10L).head().getInt(3) === 1,
      "fixture precondition: 10 starts dropped")
    // remove 11 — 10's only better duplicate — 10 must be reinstated;
    // cluster 1 contains no removed id and must pass through verbatim
    val got = Similarity.semanticDedupRetract(state, Seq(11L).toDF("vec_id"),
        "vec_id", "embedding", threshold = 0.95)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toSeq
    val full = Similarity.semanticDedup(df.where(col("vec_id") =!= 11L),
        cents2d, "vec_id", "embedding", "c_id", "c_emb", threshold = 0.95)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toSeq
    assert(got === full)
    assert(got === Seq(10L -> 0, 12L -> 0, 20L -> 1, 21L -> 0))
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
