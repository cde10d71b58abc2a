package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TopK

/** The custom two-phase top-k-per-group physical operator
  * (graft.plans.TopKPerGroup): result equivalence against the window
  * formulation, plan shape (partial below the exchange, final above),
  * and edge cases.
  */
class TopKPerGroupSpec extends SparkSpec {

  private lazy val orders =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  private def windowForm(k: Int) = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }

  private def execForm(k: Int) =
    TopK.topKPerGroupExec(orders, Seq("o_orderstatus"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), k)

  test("equals the window row_number formulation on real data") {
    for (k <- Seq(1, 3, 10)) {
      val expected = windowForm(k).select("o_orderkey").collect().map(_.getLong(0)).toSet
      val got = execForm(k).select("o_orderkey").collect().map(_.getLong(0)).toSet
      assert(got == expected, s"k=$k: exec ${got.size} rows vs window ${expected.size}")
    }
  }

  test("k beyond the group size returns the whole group") {
    val got = execForm(100000).count()
    assert(got == orders.count())
  }

  test("plan: partial phase below the exchange, final above") {
    val plan = execForm(3).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupPartial"), s"no partial phase:\n$plan")
    assert(plan.contains("TopKPerGroupFinal"), s"no final phase:\n$plan")
    val partialIdx = plan.indexOf("TopKPerGroupPartial")
    val exchangeIdx = plan.indexOf("Exchange")
    val finalIdx = plan.indexOf("TopKPerGroupFinal")
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx,
      s"phases not separated by the exchange:\n$plan")
  }

  test("multi-column groups and ascending order") {
    import spark.implicits._
    val df = Seq(
      ("a", 1, 10L), ("a", 1, 5L), ("a", 1, 7L),
      ("a", 2, 3L), ("b", 1, 1L)).toDF("g1", "g2", "v")
    val got = TopK.topKPerGroupExec(df, Seq("g1", "g2"), Seq(("v", false)), 2)
      .orderBy("g1", "g2", "v").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 1, 5L), ("a", 1, 7L), ("a", 2, 3L), ("b", 1, 1L)))
  }

  test("NULL group keys and NULL order values match the window form") {
    import spark.implicits._
    val df = Seq[(Option[String], Option[Long], Long)](
      (None, Some(5L), 1L), (None, Some(9L), 2L), (None, None, 3L),
      (Some("a"), None, 4L), (Some("a"), Some(1L), 5L), (Some("a"), Some(2L), 6L))
      .toDF("g", "v", "id").repartition(3)
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val expected = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
      .select("id").collect().map(_.getLong(0)).toSet
    val got = TopK.topKPerGroupExec(df, Seq("g"), Seq(("v", true), ("id", false)), 2)
      .select("id").collect().map(_.getLong(0)).toSet
    // null keys form one group; desc null ordering (NULLS LAST) matches
    assert(got == expected, s"got $got vs window $expected")
  }

  test("ranked form: rank equals row_number over the same order") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map { i =>
      (rnd.nextInt(5), rnd.nextInt(300).toLong, i.toLong)
    }
    val df = rows.toDF("g", "v", "id").repartition(11)
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val expected = df.withColumn("rank", row_number().over(w)).where(col("rank") <= 4)
      .select("g", "id", "rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
    val got = TopK.topKPerGroupExecRanked(df, Seq("g"),
        Seq(("v", true), ("id", false)), 4, "rank")
      .select("g", "id", "rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == expected, s"ranked exec ${got.size} vs window ${expected.size}")
  }

  test("ranked form survives downstream shuffle and filter") {
    import spark.implicits._
    val df = Seq(("a", 3L, 1L), ("a", 2L, 2L), ("a", 1L, 3L), ("b", 9L, 4L))
      .toDF("g", "v", "id").repartition(3)
    val got = TopK.topKPerGroupExecRanked(df, Seq("g"), Seq(("v", true), ("id", false)), 2, "rank")
      .where(col("rank") === 1)
      .groupBy("g").agg(min("id").as("id"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 1L), ("b", 4L)))
  }

  test("property: equals window form on seeded random skewed data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 20000).map { i =>
      (rnd.nextInt(7), rnd.nextInt(1000).toLong, i.toLong)
    }
    val df = rows.toDF("g", "v", "id").repartition(13)
    val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
    val expected = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .select("id").collect().map(_.getLong(0)).toSet
    val got = TopK.topKPerGroupExec(df, Seq("g"), Seq(("v", true), ("id", false)), 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }
}
