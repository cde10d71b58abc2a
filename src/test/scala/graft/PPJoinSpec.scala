package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Prefix-filter similarity join: losslessness of the candidate pruning
  * (every true pair survives) and exactness of the verify, checked against
  * a brute-force O(n²) pair computation over the same shingle sets.
  */
class PPJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force pairs from the SAME shingle sets the operator uses
    * (shingleRows is independently oracle-proven), so this test isolates
    * the join's pruning + verify logic.
    */
  private def brute(docs: Seq[(Long, String)], k: Int, tNum: Int, tDen: Int)
      : Set[(Long, Long, Long, Long)] = {
    val sets = Dedup.shingleRows(docs.toDF("doc_id", "text"), "text", "doc_id", k)
      .select(col("doc_id"), Dedup.md5Int60(col("sh")).as("h"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getLong(1)).toSet }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size.toLong
      uni = sa.size + sb.size - inter
      if inter * tDen >= uni * tNum
    } yield (ia, ib, inter, uni)).toSet
  }

  private def run(docs: Seq[(Long, String)], k: Int, tNum: Int, tDen: Int)
      : Set[(Long, Long, Long, Long)] =
    Dedup.prefixJaccardJoin(docs.toDF("doc_id", "text"), "text", "doc_id", k, tNum, tDen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("prefix join equals brute force on a seeded random corpus, several thresholds") {
    val rnd = new Random(42)
    val vocab = ('a' to 'p').map(_.toString)
    // near-dup structure: base docs plus mutated copies
    val base = (0 until 12).map { i =>
      (0 until 10 + rnd.nextInt(8)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val docs: Seq[(Long, String)] = base.zipWithIndex.flatMap { case (text, i) =>
      val toks = text.split(" ")
      val mutated = toks.updated(rnd.nextInt(toks.length), "zz").mkString(" ")
      Seq((i * 2L, text), (i * 2L + 1L, mutated))
    }
    for ((tNum, tDen) <- Seq((1, 2), (3, 5), (4, 5))) {
      assert(run(docs, 3, tNum, tDen) === brute(docs, 3, tNum, tDen),
        s"threshold $tNum/$tDen")
    }
  }

  test("identical docs pair at similarity 10000 bp; disjoint docs absent") {
    val docs: Seq[(Long, String)] = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five six"),
      (3L, "seven eight nine ten eleven twelve"))
    val got = Dedup.prefixJaccardJoin(docs.toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    assert(got === Seq((1L, 2L, 10000L)))
  }

  test("docs shorter than k tokens produce no pairs and no errors") {
    val docs: Seq[(Long, String)] = Seq((1L, "a b"), (2L, "a b"), (3L, "a b c d e"))
    assert(run(docs, 3, 1, 2).isEmpty)
  }
}
