package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ZIP-archive text source — the reference corpus' actual distribution
  * format (`download_data.sh:2-6` fetches `FASTAll.nt.zip` from OCLC;
  * until now a zipped corpus needed an out-of-band unzip before
  * `spark.read.text` could touch it).
  *
  * Shape: a `binaryFile` scan (one row per archive: path + content)
  * followed by a per-archive imperative decode — ZipInputStream over the
  * in-memory bytes, one output row per text line per entry. The decode
  * is the justified `flatMap` case (same rationale as
  * [[graft.ops.Multimodal]]'s media decode): a zip's central directory /
  * per-entry DEFLATE streams have no declarative equivalent, and the
  * codec registry Spark uses for `.gz` transparency has no multi-entry
  * container hook.
  *
  * Scale: a zip is NOT splittable (like gzip) and `binaryFile` holds one
  * whole archive per task — so one archive = one task = one memory-sized
  * unit. The 100 TB layout answer is the WET/WARC convention: many
  * moderate shard archives, never one giant file; `maxPartitionBytes`
  * does not apply. Entries are decoded eagerly one at a time (entry
  * bytes are drained before the next `getNextEntry`), so peak memory per
  * task is archive + largest entry.
  */
object ZipReader {

  /** All text lines of every entry of every `*.zip` under `path`:
    * (archive, entry, line). Directory entries are skipped; entry
    * content is decoded as UTF-8 and split on `\n` (with `\r\n`
    * tolerated), matching `spark.read.text`.
    */
  def readLines(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.zip")
      .load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (archive, bytes) =>
        val zin = new ZipInputStream(
          new ByteArrayInputStream(bytes), StandardCharsets.UTF_8)
        Iterator.continually(zin.getNextEntry)
          .takeWhile(_ != null)
          .filterNot(_.isDirectory)
          .flatMap { e =>
            // drain THIS entry fully before the outer iterator advances
            // (ZipInputStream is shared mutable state across entries)
            val buf = new java.io.ByteArrayOutputStream()
            val chunk = new Array[Byte](64 * 1024)
            var n = zin.read(chunk)
            while (n >= 0) { buf.write(chunk, 0, n); n = zin.read(chunk) }
            val text = new String(buf.toByteArray, StandardCharsets.UTF_8)
            val lines =
              if (text.isEmpty) Seq.empty[String]
              else text.split("\n", -1).toSeq.map(_.stripSuffix("\r")) match {
                // a trailing newline produces one phantom empty tail,
                // which spark.read.text also drops
                case init :+ "" => init
                case all => all
              }
            lines.map(l => (archive, e.getName, l))
          }
      }
      .toDF("archive", "entry", "line")
  }
}
