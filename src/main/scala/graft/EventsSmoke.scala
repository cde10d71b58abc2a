package graft

import org.apache.spark.sql.functions._

/** Scale smoke for the event/time-window family — the queries that broke
  * (and silently vanished from the round-6 gate) when the fixture's
  * timestamp physical type changed. Writes an N×-amplified copy of the
  * events table (user_id offset per copy keeps sessions/windows intact,
  * so per-user work scales in USERS, not rows-per-user) and runs the
  * SHIPPED SparkEntry query functions against it — no reimplementation,
  * the exact plans the driver grades.
  *
  * Usage: EventsSmoke [sfDir] [copies]
  */
object EventsSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 10
    val spark = GraftSession.local("graft-events-smoke")

    val dir = java.nio.file.Files.createTempDirectory("graft_evsmoke").toString
    val ev = Tables.load(spark, sfDir, "events")
    val userSpan = 1000000L
    (0 until copies).map { c =>
      ev.withColumn("user_id", col("user_id") + lit(c * userSpan))
        .withColumn("event_id", col("event_id") + lit(c * 100000000L))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val n = spark.read.parquet(s"$dir/events.parquet").count()

    val names = Seq("q35_sessionize", "q22_range_join", "q36_funnel",
      "q39_resample", "q40_range_window", "q49_hopping_window",
      "cohort_retention", "cdc_latest", "events_ewma", "events_attribution")
    println(f"EVENTS_SMOKE copies=$copies rows=$n")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // rep 1 pays codegen; report the second run
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"EVENTS_SMOKE $name secs=${(System.nanoTime() - t0) / 1e9}%.2f")
      spark.catalog.clearCache()
    }
    new scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
    spark.stop()
  }
}
