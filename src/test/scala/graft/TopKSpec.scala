package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.TopK

/** Two-pass heavy hitters: Misra-Gries candidate guarantee + end-to-end
  * equality with the brute-force computation, at several partitionings
  * (the sketch must only affect pruning, never the answer).
  */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, s"$name: $res")
  }

  private def bruteFrequent(items: Seq[String], k: Int): Set[(String, Long)] = {
    val n = items.size.toLong
    items.groupBy(identity).map { case (t, g) => (t, g.size.toLong) }
      .filter { case (_, c) => c * (k + 1) > n }.toSet
  }

  test("misraGries candidates contain every item above n/(k+1); marker is exact") {
    val genItems = Gen.listOf(Gen.oneOf((1 to 12).map(i => s"w$i")))
    val genK = Gen.choose(1, 6)
    check("mg-superset", Prop.forAll(genItems, genK) { (items, k) =>
      val out = TopK.misraGries(items.iterator, k).toList
      val cands = out.collect { case (item, _) if item != null => item }.toSet
      val markerTotal = out.collect { case (null, n) => n }.sum
      markerTotal == items.size.toLong &&
        bruteFrequent(items, k).forall { case (t, _) => cands.contains(t) }
    })
  }

  test("frequentItems is exact and partitioning-independent") {
    val words = Seq.fill(400)("the") ++ Seq.fill(250)("of") ++
      (1 to 500).map(i => s"rare${i % 97}")
    val expect = bruteFrequent(words, 5)
    for (parts <- Seq(1, 3, 16)) {
      val df = spark.sparkContext.parallelize(words, parts).toDF("w")
      val got = TopK.frequentItems(df, "w", 5)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got === expect, s"parts=$parts")
    }
  }

  test("frequentItems result is sorted by count desc, item asc") {
    val words = Seq.fill(40)("b") ++ Seq.fill(40)("a") ++ Seq.fill(10)("c")
    val df = words.toDF("w")
    val rows = TopK.frequentItems(df, "w", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows === Seq(("a", 40L), ("b", 40L)))
  }

  test("frequentItemsByGroup is exact per group and partitioning-independent") {
    val words = (Seq.fill(300)("en" -> "the") ++ Seq.fill(60)("en" -> "of") ++
      (1 to 400).map(i => "en" -> s"r${i % 83}") ++
      Seq.fill(50)("de" -> "der") ++ (1 to 60).map(i => "de" -> s"g${i % 41}"))
    val expect = words.groupBy(identity).map { case ((g, t), xs) => (g, t, xs.size.toLong) }
      .filter { case (g, _, c) =>
        c * 6 > words.count(_._1 == g).toLong }.toSet
    for (parts <- Seq(1, 7)) {
      val df = spark.sparkContext.parallelize(words, parts).toDF("g", "w")
      val got = graft.ops.TopK.frequentItemsByGroup(df, "g", "w", 5)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got === expect, s"parts=$parts")
    }
  }

  test("no persisted frames leak after frequentItems") {
    // earlier tests in this suite hold their results' backing (the
    // caller-release contract) — drop them so the baseline is empty
    graft.GraftSession.releaseAll(spark)
    val df = (1 to 1000).map(i => s"t${i % 7}").toDF("w")
    val res = TopK.frequentItems(df, "w", 10)
    res.count()
    // the result's own backing (localCheckpoint blocks on a local master)
    // is the caller's to free; anything else persisted is a leak
    graft.ops.Iterate.releaseCheckpoint(res)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("globalRowNumber matches the single-window reference at any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = (1 to 5000).map(i => ((i * 7919) % 1000, i.toLong)) // dup sort keys
    val expected = rows.sortBy(r => (r._1, r._2)).zipWithIndex
      .map { case ((_, id), idx) => (id, idx + 1L) }.toMap
    for (parts <- Seq(1, 7)) {
      val df = spark.sparkContext.parallelize(rows, parts).toDF("v", "id")
      val got = graft.ops.Rank.globalRowNumber(df, Seq(col("v"), col("id")), parts = 5)
        .select("id", "rn").as[(Long, Long)].collect().toMap
      assert(got === expected, s"input parts=$parts")
    }
  }

  test("globalRowNumber ranks survive task-index remapping consumers " +
      "(coalesce, union as non-first child)") {
    // r15 regression guard (ADVICE r14): the rank adjustment used to key
    // on LIVE spark_partition_id(), which a consumer plan that remaps
    // task indices before its first exchange (coalesce, or a union where
    // the ranked frame is a non-first child) silently re-evaluates
    // against the WRONG indices. With _pp materialized into the
    // checkpoint the rank is a pure function of row data.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = (1 to 5000).map(i => ((i * 7919) % 1000, i.toLong))
    val expected = rows.sortBy(r => (r._1, r._2)).zipWithIndex
      .map { case ((_, id), idx) => (id, idx + 1L) }.toMap
    val df = spark.sparkContext.parallelize(rows, 7).toDF("v", "id")
    val ranked = graft.ops.Rank.globalRowNumber(df, Seq(col("v"), col("id")),
      parts = 5)
    val viaCoalesce = ranked.coalesce(1)
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(viaCoalesce === expected, "coalesce(1) consumer")
    // union with a non-empty first child shifts the ranked frame's task
    // partition indices by the first child's partition count
    val shifted = spark.sparkContext.parallelize(
        Seq((-1L, -1L)), 3).toDF("id", "rn")
      .union(ranked.select("id", "rn"))
      .where(col("id") >= 0)
      .as[(Long, Long)].collect().toMap
    assert(shifted === expected, "union non-first-child consumer")
  }

  test("globalCumSum matches the single-window running sum at any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = (1 to 5000).map(i => ((i * 7919) % 1000, i.toLong, (i % 13).toLong))
    val expected = rows.sortBy(r => (r._1, r._2))
      .scanLeft((0L, 0L)) { case ((_, acc), (_, id, v)) => (id, acc + v) }
      .drop(1).toMap
    for (parts <- Seq(1, 7)) {
      val df = spark.sparkContext.parallelize(rows, parts).toDF("v", "id", "tok")
      val got = graft.ops.Rank.globalCumSum(df, Seq(col("v"), col("id")),
          "tok", "cum", parts = 5)
        .select("id", "cum").as[(Long, Long)].collect().toMap
      assert(got === expected, s"input parts=$parts")
    }
  }

  test("globalNtile matches the closed-form reference per group at any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // uneven groups (sizes 1, 3, 4, 7, 50) with duplicate sort keys
    val rows = Seq("a" -> 1, "b" -> 3, "c" -> 4, "d" -> 7, "e" -> 50).flatMap {
      case (g, n) => (1 to n).map(i => (g, (i * 31) % 5, (g.hashCode * 100 + i).toLong))
    }
    val k = 3
    val expected = rows.groupBy(_._1).flatMap { case (_, grp) =>
      val sorted = grp.sortBy(r => (r._2, r._3))
      sorted.zipWithIndex.map { case ((_, _, id), idx) =>
        id -> (1 + idx * k / sorted.size)
      }
    }
    for (parts <- Seq(1, 6)) {
      val df = spark.sparkContext.parallelize(rows, parts).toDF("g", "v", "id")
      val got = graft.ops.Rank.globalNtile(df, "g", Seq(col("v"), col("id")), k,
          parts = 4)
        .select("id", "tile").as[(Long, Int)].collect().toMap
      assert(got === expected, s"input parts=$parts")
      // every group covers tile 1..min(k, size) with sizes differing by ≤1
      val sizes = got.groupBy(_._2).view.mapValues(_.size)
      assert(sizes.keys.min == 1 && sizes.keys.max == k)
    }
  }
}
