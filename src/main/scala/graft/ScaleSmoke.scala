package graft

import java.lang.management.{ManagementFactory, MemoryType}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** Scale smoke for the ingest path: blow the demo NT corpus up by N
  * id-shifted copies of `part`, write it out as real text files, and run
  * the full FAST ingest over them — demonstrates the multi-file scan →
  * parse → persist(MEMORY_AND_DISK) → hash-agg → enrichment-join pipeline
  * at a data size where partitions spill rather than sit in the driver's
  * lap. Prints one summary line; results recorded in NOTES.md.
  *
  * Usage: ScaleSmoke [sfDir] [copies]
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 100
    val spark = GraftSession.local("graft-scale-smoke")
    val part = Tables.load(spark, sfDir, "part")

    // distinct doc ids per copy: shift the key space (sf1 keys < 1M)
    val shifted = (0 until copies).map { c =>
      part.withColumn("p_partkey", col("p_partkey") + lit(c * 1000000))
    }.reduce(_ unionByName _)

    val ntDir = java.nio.file.Files.createTempDirectory("graft_scale_nt").toString
    val t0 = System.nanoTime()
    DemoCorpus.ntFromPart(shifted).repartition(64).write.mode("overwrite").text(ntDir)
    val tGen = (System.nanoTime() - t0) / 1e9

    val lines = spark.read.text(ntDir).withColumnRenamed("value", "line")
    val nLines = lines.count()
    val t1 = System.nanoTime()
    val staged = graft.ingest.FastIngest.ingestDocsStaged(lines, lit("Topical"))
    val rows = staged.result.count() // the one materializing action
    val tIngest = (System.nanoTime() - t1) / 1e9
    staged.release()

    val peakHeapMb = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == MemoryType.HEAP)
      .map(_.getPeakUsage.getUsed).sum >> 20
    println(f"SCALE_SMOKE copies=$copies lines=$nLines docs=$rows " +
      f"genSec=$tGen%.1f ingestSec=$tIngest%.1f peakHeapMB=$peakHeapMb " +
      f"linesPerSec=${nLines / tIngest}%.0f")
    // temp NT corpus is large — clean it up before exit
    import scala.reflect.io.Directory
    new Directory(new java.io.File(ntDir)).deleteRecursively()
    spark.stop()
  }
}
