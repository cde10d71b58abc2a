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

  test("forbidPartitionIdWindows rejects pid-ranking, allows lag/cumsum and the fused rank") {
    val s = spark.newSession()
    import s.implicits._
    s.conf.set("spark.graft.forbidPartitionIdWindows", "true")
    val df = (1 to 100).map(i => (i.toLong, i % 7)).toDF("id", "v")
      .repartition(4)
    val pidW = Window.partitionBy("_pid").orderBy("id")

    // the phantom-exchange shape: ranking within "my own" partitions
    val e = intercept[Exception] {
      df.withColumn("_pid", spark_partition_id())
        .withColumn("rn", row_number().over(pidW)).collect()
    }
    assert(e.getMessage.contains("spark_partition_id"), e.getMessage)

    // lag/lead neighbor access over pid: a conscious narrow exchange — allowed
    df.withColumn("_pid", spark_partition_id())
      .withColumn("prev", lag(col("id"), 1).over(pidW)).collect()
    // ordered-frame aggregate (running sum) over pid: no expression-only
    // alternative — allowed
    df.withColumn("_pid", spark_partition_id())
      .withColumn("cum", sum(col("v")).over(pidW)).collect()
    // ranking partitioned by a REAL column: fine
    df.withColumn("rn", row_number().over(Window.partitionBy("v").orderBy("id")))
      .collect()
    // the fused global rank never builds a pid window at all
    val ranked = graft.ops.Rank.globalRowNumber(df, Seq(col("id")), parts = 4)
      .select("id", "rn").as[(Long, Long)].collect().sortBy(_._1)
    assert(ranked.map(_._2).toSeq === (1L to 100L))
    s.conf.unset("spark.graft.forbidPartitionIdWindows")
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
