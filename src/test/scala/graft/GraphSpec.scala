package graft

import scala.util.Random

import graft.ops.Graph

/** PageRank: analytic fixed points, mass conservation, and tolerance
  * equality with a naive in-memory reference on seeded random graphs
  * (float iteration → tolerance policy, like sphericalKMeans).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    Graph.pageRank(edges.toDF("s", "d"), "s", "d", iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  /** Naive reference: dense iteration with uniform dangling redistribution. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
      damping: Double = 0.85): Map[Long, Double] = {
    val es = edges.filter(e => e._1 != e._2).distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val out = es.groupBy(_._1).map { case (s, g) => s -> g.size }
    var rank = nodes.map(_ -> 1.0 / n).toMap
    (0 until iters).foreach { _ =>
      val dangling = nodes.filterNot(out.contains).map(rank).sum
      val inbound = es.groupBy(_._2).map { case (d, g) =>
        d -> g.map(e => rank(e._1) / out(e._1)).sum
      }
      rank = nodes.map(v => v ->
        ((1.0 - damping) / n +
          damping * (inbound.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    rank
  }

  test("two-node cycle converges to equal ranks; mass conserved") {
    val got = run(Seq((1L, 2L), (2L, 1L)), 20)
    assert(math.abs(got(1L) - 0.5) < 1e-9 && math.abs(got(2L) - 0.5) < 1e-9)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("dangling node redistributes mass; sink outranks source") {
    val got = run(Seq((1L, 2L)), 30)
    assert(math.abs(got.values.sum - 1.0) < 1e-9, s"mass drifted: $got")
    assert(got(2L) > got(1L))
  }

  test("star hub accumulates the most rank") {
    val got = run((2L to 6L).map(i => (i, 1L)), 15)
    assert(got(1L) === got.values.max)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("matches the naive reference on seeded random graphs") {
    val rnd = new Random(7)
    val edges = Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter(e => e._1 != e._2)
    val got = run(edges, 12)
    val ref = reference(edges, 12)
    assert(got.keySet === ref.keySet)
    got.foreach { case (node, r) =>
      assert(math.abs(r - ref(node)) < 1e-9, s"node $node: $r vs ${ref(node)}")
    }
  }
}
