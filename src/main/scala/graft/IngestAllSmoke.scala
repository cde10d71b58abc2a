package graft

import java.lang.management.{ManagementFactory, MemoryType}
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

/** sf1-class smoke for the FULL `IngestJob.runAll` path — the 7-file FAST
  * layout (pre-flight validation, per-file type tagging, the virtual
  * TermEvent second pass, the P6 skipViaf split, AND the agent→VIAF
  * disjunctive lookup-update), not just the single-stream parse that
  * [[ScaleSmoke]] covers. Each file is an id-shifted blow-up of the
  * `part`-derived demo corpus; a VIAF lookup table is generated to match
  * the agent files' sameAs ids so the J2/K4 path does real work.
  *
  * Prints one summary line (wall + peak heap); results in NOTES.md.
  *
  * Usage: IngestAllSmoke [sfDir] [copiesPerFile]
  */
object IngestAllSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 10
    val spark = GraftSession.local("graft-ingest-all-smoke")
    val part = Tables.load(spark, sfDir, "part")

    // file i, copy c → disjoint id range (sf1 part keys < 1M)
    def shiftedFor(i: Int) = (0 until copies).map { c =>
      part.withColumn("p_partkey",
        col("p_partkey") + lit((i.toLong * copies + c) * 1000000L + 1L))
    }.reduce(_ unionByName _)

    val ntDir = Files.createTempDirectory("graft_ingest_all_nt").toString
    val outDir = Files.createTempDirectory("graft_ingest_all_out").toString
    val t0 = System.nanoTime()
    IngestJob.RequiredFiles.zipWithIndex.foreach { case (f, i) =>
      val tmp = s"$ntDir/_gen_$f"
      DemoCorpus.ntFromPart(shiftedFor(i)).coalesce(1)
        .write.mode("overwrite").text(tmp)
      val piece = Files.list(Paths.get(tmp)).iterator().asScala
        .find(_.getFileName.toString.startsWith("part-")).get
      Files.move(piece, Paths.get(s"$ntDir/$f"))
    }
    // VIAF lookup table matching the agent files' sameAs ids (= 7·p for
    // even p) so the disjunctive join path actually matches rows
    val agentIdx = IngestJob.RequiredFiles.zipWithIndex.collect {
      case (f, i) if Seq("FASTCorporate.nt", "FASTEvent.nt", "FASTPersonal.nt").contains(f) => i
    }
    val viaf = agentIdx.map(shiftedFor).reduce(_ unionByName _)
      .where(col("p_partkey") % 2 === 0)
      .select(concat(lit("v"), col("p_partkey")).as("_id"),
        (col("p_partkey") * 7).cast("string").as("viaf"),
        concat(lit("lc"), col("p_partkey")).as("lcId"),
        lit(null).cast("array<int>").as("fast"))
    val tGen = (System.nanoTime() - t0) / 1e9

    val nLines = spark.read.text(ntDir).count()
    val t1 = System.nanoTime()
    val report = IngestJob.runAll(spark, ntDir, outDir, Some(viaf))
    val tIngest = (System.nanoTime() - t1) / 1e9

    val peakHeapMb = ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == MemoryType.HEAP)
      .map(_.getPeakUsage.getUsed).sum >> 20
    println(f"INGEST_ALL_SMOKE copies=$copies lines=$nLines " +
      f"fastRows=${report.fastRows} viafRows=${report.viafRows} " +
      f"genSec=$tGen%.1f ingestSec=$tIngest%.1f peakHeapMB=$peakHeapMb " +
      f"linesPerSec=${nLines / tIngest}%.0f")

    import scala.reflect.io.Directory
    new Directory(new java.io.File(ntDir)).deleteRecursively()
    new Directory(new java.io.File(outDir)).deleteRecursively()
    spark.stop()
  }
}
