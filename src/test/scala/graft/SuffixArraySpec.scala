package graft

import org.apache.spark.sql.functions._

import graft.ops.SuffixArray

/** Suffix-array construction (Manber–Myers prefix doubling) against a
  * brute-force in-memory oracle: sort every suffix token-sequence
  * lexicographically with (id, pos) tie-break — the definition itself.
  */
class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  private def bruteRanks(docs: Seq[(Long, String)]): Map[(Long, Long), Long] = {
    val sfx = for {
      (id, text) <- docs
      ws = text.split(" ", -1).toSeq
      p <- ws.indices
    } yield (ws.drop(p), id, p.toLong)
    // explicit element-wise lexicographic compare with the prefix rule
    // (a string-join proxy would need a separator below every token char)
    val seqOrd = new Ordering[(Seq[String], Long, Long)] {
      def compare(a: (Seq[String], Long, Long), b: (Seq[String], Long, Long)): Int = {
        val it = a._1.iterator.zip(b._1.iterator)
        while (it.hasNext) {
          val (x, y) = it.next()
          val c = x.compareTo(y)
          if (c != 0) return c
        }
        val c = a._1.length.compareTo(b._1.length)
        if (c != 0) c
        else {
          val ci = a._2.compareTo(b._2)
          if (ci != 0) ci else a._3.compareTo(b._3)
        }
      }
    }
    sfx.sorted(seqOrd).zipWithIndex
      .map { case ((_, id, p), i) => (id, p) -> (i + 1).toLong }.toMap
  }

  private def saMap(docs: Seq[(Long, String)], startPrefix: Int = 64): Map[(Long, Long), Long] =
    SuffixArray.build(docs.toDF("doc_id", "text"), "text", "doc_id",
        startPrefix = startPrefix)
      .as[(Long, Long, Long)].collect()
      .map { case (id, p, r) => (id, p) -> r }.toMap

  test("ranks equal the brute-force suffix sort, including duplicate docs") {
    val docs = Seq(
      (1L, "a b a b a c"),
      (2L, "b a b a c"),
      (3L, "a b a b a c"), // exact duplicate of doc 1 — ties break by id
      (4L, "c"),
      (5L, "a"))
    assert(saMap(docs) === bruteRanks(docs))
  }

  test("prefix doubling engages: repeats far longer than the seed prefix") {
    // two docs sharing a 40-token prefix with startPrefix=4 forces ~4
    // doubling rounds; a third doc diverges midway through
    val long1 = (1 to 40).map(_ % 7).mkString(" ") + " x"
    val long2 = (1 to 40).map(_ % 7).mkString(" ") + " y"
    val docs = Seq((1L, long1), (2L, long2), (3L, (1 to 10).mkString(" ")))
    assert(saMap(docs, startPrefix = 4) === bruteRanks(docs))
  }

  test("lcpNeighbors finds the longest repeated substring") {
    val docs = Seq(
      (1L, "p q r s t u v w"),
      (2L, "z z p q r s t k"),  // shares "p q r s t" (5 tokens) with doc 1
      (3L, "m n"))
    val df = docs.toDF("doc_id", "text")
    val sa = SuffixArray.build(df, "text", "doc_id", startPrefix = 4)
    val lcp = SuffixArray.lcpNeighbors(df, "text", "doc_id", sa)
    val maxRow = lcp.orderBy(col("lcp").desc).limit(1)
      .as[(Long, Long, Long, Long, Long)].collect().head
    // the max-LCP adjacent pair is the 5-token shared run
    assert(maxRow._5 === 5L)
    val ids = Set(maxRow._1, maxRow._3)
    assert(ids === Set(1L, 2L))
    // and the pair count is exactly n_suffixes - 1
    val n = docs.map(_._2.split(" ").length).sum
    assert(lcp.count() === (n - 1).toLong)
  }

  test("property: random small-alphabet corpora match brute force") {
    // tiny alphabet maximizes repeats and tie groups — the regime where
    // prefix doubling, boundary r2=0, and duplicate-suffix tie-break all
    // have to cooperate; seeded RNG keeps the run reproducible
    val rnd = new scala.util.Random(12)
    (1 to 8).foreach { trial =>
      val nDocs = 1 + rnd.nextInt(5)
      val docs = (1 to nDocs).map { i =>
        val len = 1 + rnd.nextInt(14)
        (i.toLong, Seq.fill(len)(("a".charAt(0) + rnd.nextInt(3)).toChar.toString)
          .mkString(" "))
      }
      // tiny seed prefix forces several doubling rounds even at len ~14
      assert(saMap(docs, startPrefix = 2) === bruteRanks(docs),
        s"trial $trial docs=$docs")
    }
  }

  test("build leaves only the result's own storage behind") {
    GraftSession.releaseAll(spark)
    val base = spark.sparkContext.getPersistentRDDs.size
    val docs = Seq((1L, "a b c a b c d"), (2L, "a b c")).toDF("doc_id", "text")
    val sa = SuffixArray.build(docs, "text", "doc_id", startPrefix = 2)
    sa.collect()
    graft.ops.Iterate.releaseCheckpoint(sa)
    assert(spark.sparkContext.getPersistentRDDs.size === base,
      s"leaked: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
  }

  test("fused neighborLcps matches build + lcpNeighbors pair-for-pair") {
    // 32 range partitions over ~45 suffixes forces most consecutive
    // pairs across partition boundaries — the driver-stitched path
    val docs = Seq(
      (1L, "a b c d e x"),
      (2L, "q a b c d e r"),
      (3L, "a b c d f"),
      (4L, "a b c d e"),
      (5L, "u v w x y z u v w x y z"),
      (6L, "a b"),
      (7L, "m n o p q r s t m n o p q r s t u"))
    val df = docs.toDF("doc_id", "text")
    val sa = SuffixArray.build(df, "text", "doc_id")
    val viaJoin = SuffixArray.lcpNeighbors(df, "text", "doc_id", sa)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val fused = SuffixArray.neighborLcps(df, "text", "doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(fused === viaJoin)
    val n = docs.map(_._2.split(" ").length).sum
    assert(fused.size === n - 1)

    // id-type genericity: the boundary stitch must not assume Long ids
    // (r14 review — the driver-collected stitch once getLong'd them)
    val sdf = docs.map { case (id, t) => (s"d$id", t) }.toDF("doc_id", "text")
    val sFused = SuffixArray.neighborLcps(sdf, "text", "doc_id")
      .as[(String, Long, String, Long, Long)].collect().toSet
    assert(sFused.size === n - 1)
    assert(sFused === viaJoin.map { case (a, p, b, q, l) => (s"d$a", p, s"d$b", q, l) })
  }

  test("span-dedup and neighbor-LCP pipelines leave no storage after releaseAll") {
    GraftSession.releaseAll(spark)
    val base = spark.sparkContext.getPersistentRDDs.size
    val docs = Seq(
      (1L, "a b c d e x"), (2L, "q a b c d e r"), (3L, "m n o p"))
      .toDF("doc_id", "text")
    graft.ops.Dedup.dedupSpansSa(docs, "text", "doc_id", k = 3).collect()
    SuffixArray.neighborLcps(docs, "text", "doc_id").collect()
    GraftSession.releaseAll(spark)
    assert(spark.sparkContext.getPersistentRDDs.size === base,
      s"leaked: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
  }

  test("capped lcpNeighbors escalates saturated pairs to exact values") {
    // shared 20-token repeat with cap=4: the capped compare saturates and
    // must escalate to the exact LCP; non-exact mode reports min(lcp, cap)
    val run = (1 to 20).map(_ % 3).mkString(" ")
    val docs = Seq(
      (1L, run + " x a"),
      (2L, run + " y b"),
      (3L, "q r s"))
    val df = docs.toDF("doc_id", "text")
    val sa = SuffixArray.build(df, "text", "doc_id", startPrefix = 4)
    val exact = SuffixArray.lcpNeighbors(df, "text", "doc_id", sa, cap = 4)
    val maxRow = exact.orderBy(col("lcp").desc).limit(1)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(maxRow._5 === 20L, s"escalation returned $maxRow")
    assert(Set(maxRow._1, maxRow._3) === Set(1L, 2L))
    // the default big cap agrees pair-for-pair with the tiny-cap+escalate
    val wide = SuffixArray.lcpNeighbors(df, "text", "doc_id", sa)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(exact.as[(Long, Long, Long, Long, Long)].collect().toSet === wide)
    // non-exact mode: capped at 4, never above
    val capped = SuffixArray.lcpNeighbors(df, "text", "doc_id", sa,
        cap = 4, exact = false)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(capped.map(_._5).max === 4L)
    assert(capped.length === wide.size)
  }
}
