package graft

import org.apache.spark.sql.functions._

/** Scale smoke for the IVF family (VERDICT r14 #6): recall@10 and
  * wall-clock across the (nprobe, replication) grid at ≥ 1M vectors —
  * AnnRecallSpec pins recall at fixture scale; this pins the COST CURVE
  * at the scale where the probe-pruned candidate fraction, not constant
  * overhead, decides the runtime. The outcome this smoke exists to
  * record (NOTES table): whether IVF + multi-assignment replication
  * holds enough recall at volume that a graph-ANN (HNSW-class) index is
  * not worth its build cost here.
  *
  * Corpus: `n` 64-d float vectors = hash-derived cluster centers plus
  * noise at `noisePct`% of the center range. The noise level is the
  * hardness dial, and it matters more than anything else here: at low
  * noise a query's true top-10 are same-cluster twins that co-locate in
  * one cell under ANY consistent assignment and every config scores
  * recall 1.000 (the AnnRecallSpec fixture-design lesson, reproduced at
  * 200k during r15 staging) — the measurable regime is noise comparable
  * to the center separation, where true neighbors straddle Voronoi
  * boundaries and the (nprobe, replication) dials visibly buy recall.
  * Centroids: `cells` deterministic corpus seeds (the ann_ivf policy —
  * the smoke measures the probe dial, not k-means quality). Ground
  * truth: bruteForceTopK over the same checkpointed corpus.
  *
  * Usage: AnnScaleSmoke [n] [nClusters] [cells] [nQueries] [noisePct]
  */
object AnnScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1000000
    val nClusters = if (args.length > 1) args(1).toInt else 1000
    val cells = if (args.length > 2) args(2).toInt else 256
    val nQ = if (args.length > 3) args(3).toInt else 100
    val noisePct = if (args.length > 4) args(4).toInt else 120
    val k = 10
    val spark = GraftSession.local("graft-ann-scale")
    import spark.implicits._

    def time[T](tag: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[ann-scale] $tag $s%.1f s")
      (r, s)
    }

    // cluster c center: 64 values in [-10, 10); member noise: ±(range ×
    // noisePct/100) per dim — the boundary-straddling hardness dial
    val nsScale = 20.0 * noisePct / 100.0
    val corpus = graft.ops.Iterate.materialize(
      spark.range(n).select(col("id").as("vec_id"))
        .select(col("vec_id"), expr(
          s"""transform(sequence(0, 63), j -> CAST(
             |  (CAST(pmod(xxhash64(pmod(vec_id, $nClusters), j), 20) AS DOUBLE) - 10.0)
             |  + (CAST(pmod(xxhash64(vec_id, j), 2001) AS DOUBLE) - 1000.0) / 2000.0 * $nsScale
             | AS FLOAT))""".stripMargin.replace("\n", " ")).as("emb"))).df
    System.err.println(s"[ann-scale] $n vectors, 64-d, $nClusters clusters " +
      s"(noise ±${nsScale / 2}), $cells cells, $nQ queries, k=$k")

    val qEvery = n / nQ
    val queries = corpus.where(col("vec_id") % qEvery === 0)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val centroids = corpus.where(col("vec_id") < cells)
      .select(col("vec_id").as("c_id"), col("emb").as("c_emb"))

    // exact ground truth (the expensive one-off: nQ × n cosines)
    val (truth, _) = time("brute-force ground truth") {
      graft.ops.Similarity.bruteForceTopK(corpus, queries,
          "vec_id", "emb", "q_id", "q_emb", k)
        .select(col("q_id"), col("neighbor_id"))
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    }
    require(truth.size == nQ, s"expected $nQ queries, got ${truth.size}")

    val results = for (nprobe <- Seq(1, 2, 4); repl <- Seq(1, 2)) yield {
      val (got, secs) = time(s"ivfTopK nprobe=$nprobe replication=$repl") {
        graft.ops.Similarity.ivfTopK(corpus,
            a => a.where(col("vec_id") % qEvery === 0),
            "vec_id", "emb", centroids, "c_id", "c_emb",
            k = k, nprobe = nprobe, replication = repl)
          .select(col("q_id"), col("neighbor_id"))
          .collect().groupBy(_.getLong(0))
          .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      }
      val recall = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty[Long]).intersect(t).size.toDouble / t.size
      }.sum / truth.size
      System.err.println(f"[ann-scale] nprobe=$nprobe repl=$repl " +
        f"recall@$k=$recall%.3f wall=$secs%.1f s")
      ((nprobe, repl), recall, secs)
    }
    val r = results.map { case (cfg, rec, _) => cfg -> rec }.toMap
    // pinned floors (measured r15 at 1M/256 cells/noise 1.2×: 0.745 at
    // (1,1) rising to 0.939 at (4,2) — see the NOTES table): the dials
    // must DO something and the (4,2) corner must hold its measured grade
    require(r((4, 2)) >= 0.90, s"recall@10 at nprobe=4,repl=2 = ${r((4, 2))}")
    require(r((2, 1)) >= r((1, 1)) - 1e-9, "nprobe dial went backwards")
    require(r((1, 2)) >= r((1, 1)) - 1e-9, "replication dial went backwards")
    System.err.println("[ann-scale] OK")
    spark.stop()
  }
}
