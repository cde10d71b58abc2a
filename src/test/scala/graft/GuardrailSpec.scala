package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The injected analysis guardrail: opt-in rejection of single-task
  * global windows, with the scalable forms untouched.
  */
class GuardrailSpec extends SparkSpec {

  test("forbidGlobalWindows rejects raw global windows, allows scalable forms") {
    val s = spark.newSession()
    import s.implicits._
    s.conf.set("spark.graft.forbidGlobalWindows", "true")
    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "v")

    val e = intercept[Exception] {
      df.withColumn("rn", row_number().over(Window.orderBy("id"))).collect()
    }
    assert(e.getMessage.contains("globalRowNumber"), e.getMessage)

    // partitioned window: fine
    df.withColumn("rn", row_number().over(Window.partitionBy("v").orderBy("id")))
      .collect()
    // global sort (not a window): fine
    df.orderBy("id").collect()
    // the scalable global rank passes its own guardrail (offset window
    // sits over an Aggregate — a reduced frame)
    val ranked = graft.ops.Rank.globalRowNumber(df, Seq(col("id")), parts = 4)
      .select("id", "rn").as[(Long, Long)].collect().sortBy(_._1)
    assert(ranked.map(_._2).toSeq === (1L to 100L))
  }

  test("guardrail is off by default: global windows analyze normally") {
    val s = spark.newSession()
    import s.implicits._
    val df = (1 to 10).map(_.toLong).toDF("id")
    val out = df.withColumn("rn", row_number().over(Window.orderBy("id")))
      .select("rn").as[Int].collect().sorted
    assert(out.toSeq === (1 to 10))
  }
}
