package graft

import org.apache.spark.sql.functions._

import graft.ingest.Sinks

/** Sink behaviors: overwrite + observe metrics, and bucketed co-located
  * joins (no shuffle between same-bucketed tables).
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("writeFast: overwrite, type-partitioned, bad rows dropped, metrics observed") {
    val docs = Seq(
      (1, Some(1), "Topical", "A", Seq("x"), Seq[String](), Seq[String](), Seq("a")),
      (2, Some(2), "Event", null, Seq[String](), Seq[String](), Seq[String](), Seq[String]()),
      (3, None, "Topical", "Bad", Seq[String](), Seq[String](), Seq[String](), Seq[String]()))
      .toDF("_id", "fast", "type", "prefLabel", "altLabel", "sameAsLc", "sameAsViaf", "normalized")
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val report = Sinks.writeFast(docs, s"$out/fast")
    assert(report.rows === 2) // P5 guard dropped the null-fast row
    val back = Sinks.readTable(spark, s"$out/fast")
    assert(back.count() === 2)
    assert(back.select("type").distinct().count() === 2) // partition column survives
  }

  test("bucketed tables join without a shuffle") {
    // clean any residue from a previous aborted run (dir without catalog entry)
    Seq("graft_bucket_left", "graft_bucket_right").foreach { tbl =>
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val loc = new java.io.File(s"spark-warehouse/$tbl")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val left = (1 to 1000).map(i => (i.toLong, s"L$i")).toDF("k", "lv")
    val right = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
    Sinks.writeBucketed(left, "graft_bucket_left", "k", numBuckets = 8)
    Sinks.writeBucketed(right, "graft_bucket_right", "k", numBuckets = 8)
    // disable broadcast so the planner actually uses the bucketed layout
    // (on a small fixture it would otherwise pick a broadcast join)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bucket_left")
        .join(spark.table("graft_bucket_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free co-located join, got:\n$plan")
      assert(joined.count() === 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bucket_left")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_right")
    }
  }
}
