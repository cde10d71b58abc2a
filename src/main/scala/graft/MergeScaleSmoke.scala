package graft

import org.apache.spark.sql.functions._

import graft.ingest.Sinks

/** Scale smoke for the manifest-committed merge sink (VERDICT r13 #8,
  * results in NOTES.md): millions of keys across 64 buckets, then a
  * narrow update batch, a delete-heavy batch, and a replay — pinning
  * that (a) the manifest prune bounds the stored-side read to the
  * touched buckets (measured via the version dirs each batch rewrites
  * and the bytes under them), (b) untouched buckets keep their exact
  * files across batches, and (c) replay converges at volume.
  *
  * Usage: MergeScaleSmoke [nKeys] [buckets]
  */
object MergeScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nKeys = if (args.length > 0) args(0).toLong else 4000000L
    val buckets = if (args.length > 1) args(1).toInt else 64
    val spark = GraftSession.local("graft-merge-smoke")
    val path = java.nio.file.Files.createTempDirectory("graft_merge_scale")
      .toString + "/t"

    def dirBytes(): (Long, Int) = {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try {
        import scala.jdk.CollectionConverters._
        val files = walk.iterator().asScala
          .filter(p => java.nio.file.Files.isRegularFile(p) &&
            p.toString.endsWith(".parquet")).toSeq
        (files.map(java.nio.file.Files.size(_)).sum, files.size)
      } finally walk.close()
    }
    def fileSet(): Set[String] = {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.filter(p =>
          java.nio.file.Files.isRegularFile(p) &&
            p.toString.endsWith(".parquet")).map(_.toString).toSet
      } finally walk.close()
    }
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[merge-smoke] $tag ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // batch 1: create nKeys rows
    val base = spark.range(nKeys).select(col("id").as("k"),
      concat(lit("v"), col("id")).as("v"))
    time(s"create $nKeys keys / $buckets buckets") {
      Sinks.mergeInto(spark, path, base, "k", buckets)
    }
    val (fullBytes, fullFiles) = dirBytes()
    val afterCreate = fileSet()

    // batch 2: updates + inserts confined to buckets 0/1 (xxhash spreads
    // any contiguous band over all buckets, so bucket membership is the
    // selector that proves the prune). DETERMINISTIC filters only — the
    // merge consumes its batch twice (touched-bucket observe, then the
    // upsert union), so a limit()-style order-dependent subset could
    // diverge between the two passes (r14 review).
    val bucketOf = pmod(xxhash64(col("k")), lit(buckets.toLong)).cast("int")
    val updates = spark.range(nKeys).select(col("id").as("k"))
      .where(bucketOf.isin(0, 1) && col("k") % 7 === 3)
    val inserts = spark.range(nKeys, nKeys + 50000L).select(col("id").as("k"))
      .where(bucketOf.isin(0, 1))
    val (nUpd, nIns) = (updates.count(), inserts.count())
    val batch = updates.unionByName(inserts).withColumn("v", lit("UPDATED"))
    val touchedBefore = fileSet()
    time(s"update batch ($nUpd updates + $nIns inserts, 2 buckets)") {
      Sinks.mergeInto(spark, path, batch, "k", buckets)
    }
    val afterUpdate = fileSet()
    val rewritten = afterUpdate -- touchedBefore
    val (updBytes, updFiles) = (rewritten.toSeq
      .map(p => java.nio.file.Files.size(java.nio.file.Paths.get(p))).sum,
      rewritten.size)
    val untouchedKept = (afterCreate & afterUpdate).size
    System.err.println(s"[merge-smoke] full table: $fullFiles files, " +
      f"${fullBytes / 1e6}%.1f MB; update rewrote $updFiles files, " +
      f"${updBytes / 1e6}%.1f MB (${100.0 * updBytes / fullBytes}%.1f%% of table); " +
      s"$untouchedKept untouched files kept byte-identical paths")
    require(updBytes < fullBytes / 8,
      "touched-bucket prune failed: update rewrote most of the table")

    // batch 3: delete every key of bucket 2 + replay it
    val dels = spark.range(nKeys).select(col("id").as("k"))
      .where(bucketOf === 2)
      .select(col("k"), lit("").as("v"), lit(true).as("_del"))
    val delCount = dels.count()
    time(s"delete bucket 2 ($delCount keys)") {
      Sinks.mergeInto(spark, path, dels, "k", buckets, deleteCol = Some("_del"))
    }
    val n1 = Sinks.readMerged(spark, path).count()
    time("replay the delete batch") {
      Sinks.mergeInto(spark, path, dels, "k", buckets, deleteCol = Some("_del"))
    }
    val n2 = Sinks.readMerged(spark, path).count()
    require(n1 == n2 && n1 == nKeys + nIns - delCount,
      s"replay diverged: $n1 vs $n2 (expect ${nKeys + nIns - delCount})")
    val updatedOk = Sinks.readMerged(spark, path)
      .where(col("v") === "UPDATED").count()
    require(updatedOk == nUpd + nIns,
      s"batch rows lost: $updatedOk of ${nUpd + nIns}")
    System.err.println(s"[merge-smoke] final rows $n2 " +
      s"(deleted $delCount, batch rows $updatedOk) — replay idempotent OK")
    spark.stop()
  }
}
