package graft

import org.apache.spark.sql.functions._

/** Scale smoke for the custom-state sessionizer
  * ([[graft.streaming.EventStream.sessionizedCustom]]): millions of
  * events / hundreds of thousands of users through REAL file-source
  * micro-batches, asserting (a) exact parity with the batch
  * lag/running-sum sessionization on the same rows — per-user ordinals
  * included, (b) that per-batch state DRAINS (buffered events are
  * bounded by the open tail, not the stream length; what persists is
  * the per-user ordinal counter), and (c) wall-clock per batch.
  *
  * Fixture: per user, `perUser` events at ts = base + i·step where step
  * alternates inside/outside the gap via a hash — so sessions of mixed
  * lengths, deterministic and rebuildable on the batch side. Files are
  * staged in controlled mtime order with a final per-user flush file
  * (the streaming_replay_sessionize topology) so the tail closes.
  *
  * Usage: SessionizeScaleSmoke [nUsers] [perUser] [files]
  */
object SessionizeScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nUsers = if (args.length > 0) args(0).toInt else 200000
    val perUser = if (args.length > 1) args(1).toInt else 10
    val nFiles = if (args.length > 2) args(2).toInt else 8
    val spark = GraftSession.local("graft-sess-scale")
    import spark.implicits._
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    val gapUs = 30L * 60 * 1000000L
    val lateness = "3650 days"
    val lateNs = 3650L * 86400L * 1000000000L
    // event i of user u: step inside gap (5 min) or outside (2 h) by hash
    // → deterministic multi-session structure; ts in NANOS (Event.ts)
    val base = 1700000000000000000L // ~2023 epoch nanos
    val events = spark.range(nUsers.toLong * perUser)
      .select(
        col("id").as("event_id"),
        (col("id") % nUsers).as("user_id"),
        (col("id") / nUsers).as("_i"))
      .select(col("event_id"), col("user_id"),
        (lit(base) + col("user_id") * 1000000L +
          expr(s"""aggregate(sequence(0, CAST(_i AS INT)), 0L, (acc, j) ->
            | acc + CASE WHEN j = 0 THEN 0L
            |   WHEN pmod(xxhash64(user_id, j), 4) = 0 THEN ${2L * 3600 * 1000000000L}
            |   ELSE ${5L * 60 * 1000000000L} END)""".stripMargin.replace("\n", " ")))
          .as("ts"),
        (pmod(xxhash64(col("event_id")), lit(1000L)).cast("double") / 100.0)
          .as("value"),
        lit("e").as("event_type"))
      .select("event_id", "ts", "user_id", "event_type", "value")
    val staged = java.nio.file.Files.createTempDirectory("graft_sess_scale").toString
    def stageOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$staged/_stage_$name"
      df.repartition(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(staged, s"$name.parquet"))
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(tmp))
    }
    (0 until nFiles).foreach(i =>
      stageOne(events.where(pmod(col("event_id"), lit(nFiles)) === i), f"c$i%02d"))
    val maxTs = events.agg(max("ts")).head.getLong(0)
    val flushTs = maxTs + lateNs + gapUs * 1000L + 86400L * 1000000000L
    stageOne(events.select("user_id").distinct()
      .select(lit(-1L).as("event_id"), lit(flushTs).as("ts"), col("user_id"),
        lit("_flush").as("event_type"), lit(0.0).as("value")), "zflush")
    System.err.println(s"[sess-scale] ${nUsers.toLong * perUser} events, " +
      s"$nUsers users, $nFiles files + flush, staged at $staged")

    // streaming run
    val t0 = System.nanoTime()
    val src = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 2).parquet(staged)
    val q = graft.streaming.EventStream.sessionizedCustom(
        src.as[graft.streaming.EventStream.Event], gapUs = gapUs,
        lateness = lateness)
      .writeStream.format("memory").queryName("sess_scale_sink")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    // state drain: after the flush batch the buffers hold only the
    // per-user flush singletons; total state rows stay O(users)
    val lastState = q.lastProgress.stateOperators
    lastState.foreach(so => System.err.println(
      s"[sess-scale] state rows=${so.numRowsTotal} updated=${so.numRowsUpdated}"))
    val stateRows = lastState.map(_.numRowsTotal).sum
    q.stop()
    val streamSecs = (System.nanoTime() - t0) / 1e9
    val streamed = spark.table("sess_scale_sink")
    val nOut = streamed.count()
    System.err.println(f"[sess-scale] streamed $nOut sessions in $streamSecs%.1f s")
    require(stateRows <= 2L * nUsers,
      s"state did not drain: $stateRows rows for $nUsers users")

    // batch twin (the q35 shape) over the same rows
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
    val batch = events
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_id"), col("value"))
      .withColumn("new_sess",
        when(col("ts_us") - lag("ts_us", 1).over(w) > gapUs ||
            lag("ts_us", 1).over(w).isNull, 1).otherwise(0))
      .withColumn("session_seq", sum("new_sess").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_events"),
        (max("ts_us") - min("ts_us")).as("dur_us"),
        round(sum(col("value").cast("decimal(20,6)")), 2).cast("double").as("sum_val"))
    def digest(df: org.apache.spark.sql.DataFrame) = df
      .agg(count(lit(1)).as("n"),
        expr("bit_xor(xxhash64(user_id, session_seq, n_events, dur_us, CAST(sum_val AS STRING)))").as("h"))
      .head
    val ds = digest(streamed.select("user_id", "session_seq", "n_events",
      "dur_us", "sum_val"))
    val db = digest(batch)
    require(ds == db, s"stream/batch parity broke: $ds vs $db")
    System.err.println(s"[sess-scale] parity OK: ${ds.getLong(0)} sessions, " +
      s"digest ${ds.getLong(1)}")
    spark.stop()
  }
}
