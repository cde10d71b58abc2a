package graft

import org.apache.spark.sql.functions._

import graft.ingest.{FastIngest, Sinks}

/** End-to-end ingest job — the engine's equivalent of the reference's
  * master entry point (`lib/ingest.js:26-95`): read NT files, build the
  * `fast` table, update the `viaf` table, write both.
  *
  * Usage: IngestJob <ntPathOrDir> <docType> <outDir> [viafParquet]
  * (With no args, runs a self-contained demo over an NT corpus generated
  * from the sf0.001 `part` fixture.)
  */
object IngestJob {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("graft-ingest")
    val outDir = if (args.length >= 3) args(2) else "/tmp/graft_ingest_out"

    val (lines, docType) =
      if (args.length >= 2) (spark.read.text(args(0)).withColumnRenamed("value", "line"), args(1))
      else {
        val part = Tables.load(spark, "/root/testdata/sf0.001", "part")
        (DemoCorpus.ntFromPart(part), "Topical")
      }

    val fragments = FastIngest.project(FastIngest.parse(lines)).cache()
    val docs = FastIngest.enrich(
      FastIngest.buildDocs(fragments, lit(docType)),
      FastIngest.sameAsLabels(fragments))
    val fastReport = Sinks.writeFast(docs, s"$outDir/fast")

    if (args.length >= 4) {
      val viaf = spark.read.parquet(args(3))
      val updated = FastIngest.viafUpdate(FastIngest.agentOtherIds(fragments), viaf)
      val viafReport = Sinks.writeViaf(updated, s"$outDir/viaf")
      println(s"VIAF_ROWS=${viafReport.rows}")
    }
    fragments.unpersist()
    println(s"FAST_ROWS=${fastReport.rows} OUT=$outDir")
    val back = Sinks.readTable(spark, s"$outDir/fast")
    println(s"READBACK_ROWS=${back.count()} TYPES=${back.select("type").distinct().count()}")
    spark.stop()
  }
}
