package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** WARC / WET container source — the format web-scale text corpora are
  * actually distributed in (ISO 28500; the Common Crawl convention of
  * one gzip MEMBER per record, members concatenated into ~1 GB shard
  * files). The reference pipeline ingests a zipped NT dump
  * (`download_data.sh:2-6`); a training-data engine at 100 TB ingests
  * crawl shards, so this is the extension twin of [[ZipReader]] for the
  * corpus format that actually exists at that scale.
  *
  * Shape: a `binaryFile` scan (one row per shard) followed by a
  * per-shard imperative walk — the justified `flatMap` case, exactly as
  * [[ZipReader]]: record framing over a multi-member DEFLATE stream has
  * no declarative equivalent. One shard = one task = one memory-sized
  * unit; the 100 TB layout answer is the shard convention itself (many
  * ~1 GB files — Common Crawl ships ~64k of them per crawl), never one
  * giant archive. Peak memory per task is shard + inflated shard; a
  * seek-capable deploy can instead split on member boundaries (each
  * record is its own gzip member precisely so that byte-offset indexes
  * work), which is why the emitted `offset` column is the INFLATED
  * record offset — the join key against such an index.
  *
  * Strictness follows the media-decode discipline
  * ([[graft.ops.JpegPixels]]): framing is validated per the public spec
  * (version line, CRLF header block, `Content-Length` exact, CRLF CRLF
  * record terminator) and a malformed record poisons FRAMING — every
  * byte after it is unreliable — so the walk stops and reports the tail
  * as one quarantine row rather than resynchronising heuristically and
  * emitting almost-right records. Bad HTTP payloads inside a
  * well-framed record quarantine only that record.
  */
object WarcReader {

  /** One parsed record. `httpStatus`/`httpContentType`/`body` describe
    * the HTTP payload for `response` records; for `warcinfo` /
    * `conversion` / other types the block itself is the body and the
    * HTTP fields are None. `offset` is the record's byte offset in the
    * INFLATED shard stream (member-boundary index join key).
    */
  final case class WarcRec(
      shard: String,
      offset: Long,
      warc_type: String,
      record_id: String,
      target_uri: Option[String],
      warc_date: Option[String],
      content_type: Option[String],
      http_status: Option[Int],
      http_content_type: Option[String],
      body: Array[Byte])

  /** One rejected record (or lost-framing tail): where and why. */
  final case class WarcBad(shard: String, offset: Long, reason: String)

  private val Crlf = "\r\n".getBytes(StandardCharsets.US_ASCII)

  /** Inflate a possibly multi-member gzip shard; pass non-gzip bytes
    * through unchanged (uncompressed `.warc` files are legal). JDK
    * `GZIPInputStream` consumes concatenated members natively. A 1 GB
    * cap bounds hostile-shard allocation (the JpegPixels plane-cap
    * lesson): real shards are sized ~1 GB by convention, and a crafted
    * 10 KB bomb inflating past the cap rejects instead of OOMing the
    * executor.
    */
  def inflateShard(bytes: Array[Byte],
                   maxInflated: Long = 1L << 30): Option[Array[Byte]] = {
    if (bytes == null) return None
    if (bytes.length < 2 || (bytes(0) & 0xff) != 0x1f ||
        (bytes(1) & 0xff) != 0x8b) return Some(bytes)
    val out = new ByteArrayOutputStream(math.min(bytes.length.toLong * 4,
      1L << 20).toInt)
    try {
      val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      val chunk = new Array[Byte](64 * 1024)
      var n = in.read(chunk)
      while (n >= 0) {
        if (out.size().toLong + n > maxInflated) return None
        out.write(chunk, 0, n)
        n = in.read(chunk)
      }
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }
  }

  /** Index of the first CRLF CRLF at-or-after `from`, or -1. */
  private def headerEnd(p: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < p.length) {
      if (p(i) == '\r' && p(i + 1) == '\n' && p(i + 2) == '\r' &&
          p(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Parse a CRLF-separated header block into lowercased-name pairs.
    * Obs-fold continuation lines (leading SP/TAB) append to the prior
    * value; a line with no colon fails the block.
    */
  private def parseHeaders(text: String): Option[Vector[(String, String)]] = {
    var out = Vector.empty[(String, String)]
    for (line <- text.split("\r\n", -1)) {
      if (line.nonEmpty && (line(0) == ' ' || line(0) == '\t')) {
        if (out.isEmpty) return None
        val (k, v) = out.last
        out = out.init :+ (k -> (v + " " + line.trim))
      } else if (line.nonEmpty) {
        val c = line.indexOf(':')
        if (c <= 0) return None
        out = out :+ (line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT) ->
          line.substring(c + 1).trim)
      }
    }
    Some(out)
  }

  private def header(hs: Vector[(String, String)], name: String): Option[String] =
    hs.collectFirst { case (k, v) if k == name => v }

  /** Decode an HTTP/1.1 chunked transfer-coding body. Strict: hex size
    * line, exact chunk bytes, CRLF after every chunk, terminating
    * 0-chunk (trailers tolerated and dropped).
    */
  private def unchunk(p: Array[Byte], from: Int, until: Int): Option[Array[Byte]] = {
    val out = new ByteArrayOutputStream()
    var i = from
    while (true) {
      var j = i
      while (j + 1 < until && !(p(j) == '\r' && p(j + 1) == '\n')) j += 1
      if (j + 1 >= until) return None
      val sizeLine = new String(p, i, j - i, StandardCharsets.US_ASCII)
      val hexPart = sizeLine.takeWhile(c => c != ';').trim
      if (hexPart.isEmpty || !hexPart.forall(c =>
          Character.digit(c, 16) >= 0)) return None
      val size = try java.lang.Long.parseLong(hexPart, 16)
      catch { case _: NumberFormatException => return None }
      if (size < 0 || size > until - (j + 2)) return None
      if (size == 0) return Some(out.toByteArray) // trailers dropped
      out.write(p, j + 2, size.toInt)
      i = j + 2 + size.toInt
      if (i + 1 >= until || p(i) != '\r' || p(i + 1) != '\n') return None
      i += 2
    }
    None // unreachable
  }

  /** Parse the inflated bytes of one shard into records + quarantine
    * rows. Framing is sequential: the first malformed frame ends the
    * walk with a lost-framing quarantine row covering the tail.
    */
  def parseShard(shard: String, inflated: Array[Byte]): (Vector[WarcRec], Vector[WarcBad]) = {
    val p = inflated
    var recs = Vector.empty[WarcRec]
    var bad = Vector.empty[WarcBad]
    var i = 0
    def lost(off: Int, why: String): Unit =
      bad = bad :+ WarcBad(shard, off.toLong, s"framing lost: $why")
    while (i < p.length) {
      val off = i
      // version line
      val he = headerEnd(p, i)
      if (he < 0) { lost(off, "no CRLFCRLF header terminator"); return (recs, bad) }
      val head = new String(p, i, he - i, StandardCharsets.UTF_8)
      val nl = head.indexOf("\r\n")
      val versionLine = if (nl < 0) head else head.substring(0, nl)
      if (!versionLine.startsWith("WARC/")) {
        lost(off, s"expected WARC/ version line, got '${versionLine.take(20)}'")
        return (recs, bad)
      }
      parseHeaders(if (nl < 0) "" else head.substring(nl + 2)) match {
        case None => lost(off, "malformed WARC header block"); return (recs, bad)
        case Some(hs) =>
          val lenOpt = header(hs, "content-length").flatMap(v =>
            try Some(java.lang.Long.parseLong(v)) catch {
              case _: NumberFormatException => None })
          lenOpt match {
            case None =>
              lost(off, "missing/invalid Content-Length"); return (recs, bad)
            case Some(len) if len < 0 || he + 4 + len + 4 > p.length =>
              lost(off, "Content-Length past shard end"); return (recs, bad)
            case Some(len) =>
              val blockFrom = he + 4
              val blockUntil = (blockFrom + len).toInt
              if (!(p(blockUntil) == '\r' && p(blockUntil + 1) == '\n' &&
                    p(blockUntil + 2) == '\r' && p(blockUntil + 3) == '\n')) {
                lost(off, "missing CRLFCRLF record terminator")
                return (recs, bad)
              }
              val wType = header(hs, "warc-type").getOrElse("")
              if (wType.isEmpty) {
                bad = bad :+ WarcBad(shard, off.toLong, "missing WARC-Type")
              } else {
                val cType = header(hs, "content-type")
                val isHttpResponse = wType == "response" &&
                  cType.exists(_.toLowerCase(java.util.Locale.ROOT).startsWith("application/http"))
                val rec0 = WarcRec(shard, off.toLong, wType,
                  header(hs, "warc-record-id").getOrElse(""),
                  header(hs, "warc-target-uri"), header(hs, "warc-date"),
                  cType, None, None,
                  java.util.Arrays.copyOfRange(p, blockFrom, blockUntil))
                if (isHttpResponse)
                  parseHttpResponse(p, blockFrom, blockUntil) match {
                    case Some((status, hct, body)) =>
                      recs = recs :+ rec0.copy(http_status = Some(status),
                        http_content_type = hct, body = body)
                    case None =>
                      bad = bad :+ WarcBad(shard, off.toLong,
                        "malformed HTTP response payload")
                  }
                else recs = recs :+ rec0
              }
              i = blockUntil + 4
          }
      }
    }
    (recs, bad)
  }

  /** Parse an HTTP response payload: status line + headers + body, with
    * chunked transfer-coding decoded. Returns (status, content-type,
    * body bytes).
    */
  private def parseHttpResponse(p: Array[Byte], from: Int,
      until: Int): Option[(Int, Option[String], Array[Byte])] = {
    val he = headerEnd(p, from)
    if (he < 0 || he >= until) return None
    val head = new String(p, from, he - from, StandardCharsets.UTF_8)
    val nl = head.indexOf("\r\n")
    val statusLine = if (nl < 0) head else head.substring(0, nl)
    val parts = statusLine.split(" ", 3)
    if (parts.length < 2 || !parts(0).startsWith("HTTP/")) return None
    val status = try parts(1).toInt catch {
      case _: NumberFormatException => return None }
    if (status < 100 || status > 599) return None
    parseHeaders(if (nl < 0) "" else head.substring(nl + 2)).flatMap { hs =>
      val chunked = header(hs, "transfer-encoding")
        .exists(_.toLowerCase(java.util.Locale.ROOT).contains("chunked"))
      val bodyOpt =
        if (chunked) unchunk(p, he + 4, until)
        else Some(java.util.Arrays.copyOfRange(p, he + 4, until))
      bodyOpt.map(b => (status, header(hs, "content-type"), b))
    }
  }

  /** Per-shard record explosion over any (path, content) frame — the
    * one parse stage batch and streaming share (stateless flatMap, so
    * Structured Streaming runs it unchanged).
    */
  def recordsOf(shards: DataFrame): DataFrame = {
    val spark = shards.sparkSession
    import spark.implicits._
    shards.select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (shard, bytes) =>
        inflateShard(bytes) match {
          case None => Vector.empty[WarcRec]
          case Some(inf) => parseShard(shard, inf)._1
        }
      }
      .toDF()
  }

  /** All records of every `*.warc` / `*.warc.gz` shard under `path`.
    * Columns: shard, offset, warc_type, record_id, target_uri,
    * warc_date, content_type, http_status, http_content_type, body.
    */
  def records(spark: SparkSession, path: String): DataFrame =
    recordsOf(spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(path))

  /** Continuous crawl ingestion: the same parse over a binaryFile
    * STREAM — new shards appearing under `path` become record
    * micro-batches (the shape a live crawler feeds the pipeline;
    * `maxFilesPerTrigger` bounds per-batch memory at shard granularity,
    * matching the one-shard-one-task contract).
    */
  def recordsStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 2): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    recordsOf(spark.readStream.format("binaryFile").schema(schema)
      .option("pathGlobFilter", "*.warc*")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .load(path))
  }

  /** Quarantine side channel (the nt_quarantine pattern): one row per
    * rejected record / lost-framing tail / oversized-or-corrupt shard.
    */
  def quarantine(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (shard, bytes) =>
        inflateShard(bytes) match {
          case None =>
            Vector(WarcBad(shard, 0L, "shard not inflatable (corrupt gzip or over cap)"))
          case Some(inf) => parseShard(shard, inf)._2
        }
      }
      .toDF()
  }

  // ---- fixture writer (scaffolding — the Common Crawl member-per-record
  // convention, used by specs and the staged source_warc corpus) ----

  /** One record to write: (warcType, targetUri, date, httpStatus,
    * httpContentType, body, chunked). Non-response types ignore the HTTP
    * fields and write the body as the raw block.
    */
  final case class WriteRec(warcType: String, targetUri: String, date: String,
      httpStatus: Int, httpContentType: String, body: Array[Byte],
      chunked: Boolean = false)

  /** Serialize records as a multi-member `.warc.gz` shard: each record
    * its own gzip member (so byte-offset indexes and member-splitting
    * work), block framed per ISO 28500.
    */
  def writeShardGz(records: Seq[WriteRec]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.zipWithIndex.foreach { case (r, idx) =>
      val block: Array[Byte] =
        if (r.warcType == "response") {
          val payload =
            if (r.chunked) {
              val b = new ByteArrayOutputStream()
              // split into two chunks to exercise multi-chunk decode
              val cut = r.body.length / 2
              for ((f, u) <- Seq((0, cut), (cut, r.body.length)) if u > f) {
                b.write(s"${(u - f).toHexString}\r\n"
                  .getBytes(StandardCharsets.US_ASCII))
                b.write(r.body, f, u - f)
                b.write(Crlf)
              }
              b.write("0\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
              b.toByteArray
            } else r.body
          val httpHead = new StringBuilder()
            .append("HTTP/1.1 ").append(r.httpStatus)
            .append(if (r.httpStatus == 200) " OK" else " X").append("\r\n")
            .append("Content-Type: ").append(r.httpContentType).append("\r\n")
          if (r.chunked) httpHead.append("Transfer-Encoding: chunked\r\n")
          else httpHead.append("Content-Length: ").append(r.body.length)
            .append("\r\n")
          httpHead.append("\r\n")
          val hb = httpHead.toString.getBytes(StandardCharsets.US_ASCII)
          val b = new ByteArrayOutputStream()
          b.write(hb); b.write(payload)
          b.toByteArray
        } else r.body
      val wHead = new StringBuilder()
        .append("WARC/1.0\r\n")
        .append("WARC-Type: ").append(r.warcType).append("\r\n")
        .append("WARC-Record-ID: <urn:uuid:rec-").append(idx).append(">\r\n")
      if (r.targetUri.nonEmpty)
        wHead.append("WARC-Target-URI: ").append(r.targetUri).append("\r\n")
      if (r.date.nonEmpty)
        wHead.append("WARC-Date: ").append(r.date).append("\r\n")
      wHead.append("Content-Type: ").append(
          if (r.warcType == "response") "application/http; msgtype=response"
          else if (r.warcType == "conversion") "text/plain"
          else "application/warc-fields").append("\r\n")
        .append("Content-Length: ").append(block.length).append("\r\n\r\n")
      val member = new ByteArrayOutputStream()
      val gz = new GZIPOutputStream(member)
      gz.write(wHead.toString.getBytes(StandardCharsets.US_ASCII))
      gz.write(block)
      gz.write(Crlf); gz.write(Crlf)
      gz.close()
      member.writeTo(out)
    }
    out.toByteArray
  }
}
