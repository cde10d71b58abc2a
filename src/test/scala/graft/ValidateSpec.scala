package graft

import org.apache.spark.sql.functions._

import graft.ops.Validate

class ValidateSpec extends SparkSpec {

  test("null predicate is a violation, not a pass") {
    import spark.implicits._
    val df = Seq(Some(1), None, Some(3)).toDF("x")
    val out = Validate.checkRows(df, Seq("x_gt_2" -> (col("x") > 2)))
      .collect().head
    // x=1 false, x=null null, x=3 true → 2 violations of 3 rows
    assert(out.getString(0) == "x_gt_2")
    assert(out.getLong(1) == 2L)
    assert(out.getLong(2) == 3L)
  }

  test("one output row per rule, shared n_rows, single scan") {
    import spark.implicits._
    val df = Seq(1, 2, 3, 4).toDF("x")
    val out = Validate.checkRows(df, Seq(
        "pos" -> (col("x") > 0), "lt3" -> (col("x") < 3)))
      .orderBy("rule").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("lt3", "pos"))
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 0L))
    assert(out.forall(_.getLong(2) == 4L))
  }

  test("checkFk counts orphan AND null child keys as violations") {
    import spark.implicits._
    val child = Seq(Some(1), Some(2), None, Some(99)).toDF("k")
    val parent = Seq(1, 2, 3).toDF("pk")
    val out = Validate.checkFk("fk", child, "k", parent, "pk").collect().head
    assert(out.getString(0) == "fk")
    assert(out.getLong(1) == 2L, "null + orphan(99)")
    assert(out.getLong(2) == 4L)
  }
}
