package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.{MediaFeatures, MediaRecord, PerceptualHash, PixelStats}

/** Multimodal column handling: image/audio/video travel as opaque `BINARY`
  * payloads with typed metadata; decode / feature-extraction runs as typed
  * `mapPartitions` so each task amortizes per-batch setup (codec init,
  * model load) exactly like a Pandas-UDF batch would.
  *
  * Image HEADER decode (media type + pixel dimensions for PNG/GIF/JPEG/BMP)
  * is real — pure-JVM parsing of the public container formats, see
  * [[ImageHeaders]] / [[BmpPixels]]. Full PIXEL decode is real for 24-bpp
  * uncompressed BMP ([[decodePixels]] — the format that needs no codec
  * library); compressed-pixel formats and audio/video samples remain a
  * STUB — no codec libraries exist in this environment — but a
  * *deterministic* one (md5-derived pseudo-dimensions), so the
  * surrounding plumbing (schema, partitioning, batch shape) is real and
  * oracle-testable. Swap `decodeStub` for a real codec at deploy time.
  */
object Multimodal {

  /** STUB decoder: byte count, md5 checksum, and pseudo width/height
    * derived from the checksum. Deterministic → oracle-checkable.
    */
  def decodeStub(payload: Array[Byte]): (Long, String, Int, Int) = {
    val checksum = md5hex(payload)
    val h = java.lang.Long.parseLong(checksum.substring(0, 8), 16)
    (payload.length.toLong, checksum, (h % 640L).toInt + 1, (h % 480L).toInt + 1)
  }

  private def md5hex(payload: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(payload).map("%02x".format(_)).mkString

  /** Media types eligible for magic-byte sniffing. Text and other typed
    * payloads are NEVER sniffed: a text document that happens to start
    * with `GIF87a` must take the declared-type path, not be reinterpreted
    * as an image.
    */
  private def sniffable(mediaType: String): Boolean =
    mediaType == null || mediaType.isEmpty ||
      mediaType.startsWith("image/") ||
      mediaType == "application/octet-stream" || mediaType == "binary"

  /** Decode/feature-extract over a typed Dataset. One `mapPartitions` pass:
    * per-partition codec setup happens once per task, not once per row.
    * Payloads DECLARED as image/untyped binary whose magic bytes identify a
    * known image container get REAL header decode (detected media type +
    * pixel dimensions); anything else falls back to the deterministic stub
    * with the record's declared type.
    */
  def extractFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // per-partition setup would go here (codec/model init)
      it.map { r =>
        (if (sniffable(r.media_type))
           ImageHeaders.parse(r.payload)
             .orElse(BmpPixels.dimensions(r.payload)
               .map { case (w, h) => ("image/bmp", w, h) })
         else None) match {
          case Some((mediaType, w, h)) =>
            MediaFeatures(r.media_id, mediaType, r.payload.length.toLong,
              md5hex(r.payload), w, h)
          case None =>
            val (n, sum, w, h) = decodeStub(r.payload)
            MediaFeatures(r.media_id, r.media_type, n, sum, w, h)
        }
      }
    }
  }

  /** REAL pixel decode over a typed Dataset: one `mapPartitions` pass,
    * one linear walk per payload — 24-bpp BI_RGB BMP ([[BmpPixels]], the
    * uncompressed format), 8-bit grey/RGB PNG ([[PngPixels]], real zlib
    * inflate + scanline unfiltering via the JVM's built-in Inflater), or
    * baseline JPEG ([[JpegPixels]], huffman entropy decode + IDCT +
    * 4:2:0 upsampling — the web-crawl-dominant codec). Records whose
    * payload is none of these are dropped (the "decode what you can"
    * profiling semantic); pair with [[extractFeatures]] when every
    * record must produce a row.
    * Per-channel sums are exact integers, so downstream
    * means/normalization are deterministic cross-engine.
    */
  def decodePixels(records: Dataset[MediaRecord]): Dataset[PixelStats] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        BmpPixels.decode(r.payload).map(s =>
          PixelStats(r.media_id, "image/bmp", s.width, s.height,
            s.nPx, s.sumR, s.sumG, s.sumB))
          .orElse(PngPixels.decode(r.payload).map(s =>
            PixelStats(r.media_id, "image/png", s.width, s.height,
              s.nPx, s.sumR, s.sumG, s.sumB)))
          .orElse(JpegPixels.decode(r.payload).map(s =>
            PixelStats(r.media_id, "image/jpeg", s.width, s.height,
              s.nPx, s.sumR, s.sumG, s.sumB)))
          .orElse(GifPixels.decode(r.payload).map { g =>
            // a GIF's first-frame composited canvas is its still image
            val f = g.frames.head
            PixelStats(r.media_id, "image/gif", g.width, g.height,
              g.width.toLong * g.height, f.sumR, f.sumG, f.sumB)
          })
          .orElse(TiffPixels.decode(r.payload).map(s =>
            PixelStats(r.media_id, "image/tiff", s.width, s.height,
              s.nPx, s.sumR, s.sumG, s.sumB)))
      }
    }
  }

  /** Frame sampling over animated GIFs ([[GifPixels]]) — the video
    * pipeline's frame-extract shape on the one codec pure-JVM decodes
    * exactly: every `every`-th frame's whole-canvas composited stats,
    * one row per kept frame. Decode is per-record sequential (frames
    * share LZW/composite state), so parallelism comes from record count
    * — exactly how a video corpus distributes (shard by file, never by
    * frame). Records that don't decode are dropped (profiling
    * semantics, as [[decodePixels]]).
    */
  def gifFrameSamples(records: Dataset[MediaRecord],
      every: Int): Dataset[graft.model.FrameSample] = {
    import records.sparkSession.implicits._
    require(every >= 1, s"sample period $every")
    records.mapPartitions { it =>
      it.flatMap { r =>
        GifPixels.decode(r.payload).toSeq.flatMap(_.frames)
          .filter(_.idx % every == 0)
          .map(f => graft.model.FrameSample(r.media_id, f.idx, f.delayCs,
            f.sumR, f.sumG, f.sumB))
      }
    }
  }

  /** Perceptual average-hash per decodable BMP ([[BmpPixels.aHashHex]]):
    * the near-duplicate IMAGE key — re-encodes/minor edits of the same
    * picture land in the same (or Hamming-close) bucket, so image dedup
    * becomes the same hash-groupBy shape as text `dedup_exact`. Records
    * that don't decode are dropped (profiling semantics, as
    * [[decodePixels]]).
    */
  def perceptualHashes(records: Dataset[MediaRecord]): Dataset[PerceptualHash] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        val bmp = for {
          dims <- BmpPixels.dimensions(r.payload)
          hex <- BmpPixels.aHashHex(r.payload)
        } yield PerceptualHash(r.media_id, dims._1, dims._2, hex)
        // JPEG shares the identical 8×8-block construction, so the same
        // pixels hash the same across formats — cross-format re-encodes
        // land in one bucket (JpegPixels.aHashHex scaladoc); one parse +
        // one pixel walk per record
        bmp.orElse(JpegPixels.aHash(r.payload).map { case (w, h, hex) =>
          PerceptualHash(r.media_id, w, h, hex) })
      }
    }
  }

  /** Windowed audio energy per decodable mono 16-bit PCM WAV
    * ([[WavPcm.pcm16WindowStats]]): per fixed-size sample window, the
    * exact integer sample sum and energy (Σs²) plus a silence flag
    * (mean square below `silenceMsq`, decided by integer cross-multiply
    * — no float RMS). The profiling pass behind silence trimming and
    * speech/music gating; rows per record = ⌈samples/window⌉, flat
    * schema, so downstream aggs stay ordinary key-partitioned shuffles.
    */
  def audioWindows(records: Dataset[MediaRecord], windowSamples: Int,
                   silenceMsq: Long = 10000L): DataFrame = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      WavPcm.pcm16WindowStats(r.payload, windowSamples).toSeq.flatten.map(w =>
        (r.media_id, w.windowId, w.nSamples, w.sumS, w.sumSq,
          if (w.sumSq < w.nSamples * silenceMsq) 1 else 0))
    }.toDF("media_id", "window_id", "n_s", "sum_s", "sum_sq", "silent")
  }

  /** Wrap a text corpus as media records (payload = UTF-8 bytes) — the
    * fixture path for exercising the binary plumbing without real media.
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").as("media_id"),
        lit("text/plain").as("media_type"),
        col("text").cast("binary").as("payload"),
        map(lit("source"), col("source")).as("meta"))
      .as[MediaRecord]
  }

  /** STUB resize: deterministic byte-decimation standing in for a real
    * image resampler (pick every `factor`-th byte). The plumbing — typed
    * map, payload-in/payload-out schema, metadata update — is what a real
    * codec slots into.
    */
  def resizeStub(records: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    import records.sparkSession.implicits._
    records.map { r =>
      val out = r.payload.zipWithIndex.collect { case (b, i) if i % factor == 0 => b }
      r.copy(payload = out,
        meta = r.meta + ("resize_factor" -> factor.toString,
          "orig_bytes" -> r.payload.length.toString))
    }
  }

  /** Near-duplicate IMAGE detection by perceptual-hash Hamming distance:
    * Manku banding over the 64-bit average hash — 4 disjoint 16-bit
    * bands, lossless for Hamming ≤ 3 by pigeonhole (≤ 3 flipped bits
    * cannot touch all 4 bands) — then exact popcount verification on the
    * band-colliding candidates. Runs over the DISTINCT hash-class table
    * (image dedup collapses exact classes first, the dedup_exact
    * groupBy shape), so the self-join is |classes|-bounded and each band
    * is an equi-join key — the image twin of [[Dedup.simhashPairs]]'
    * text banding. Input rows carry the hash as the 16-hex-char
    * `hexCol`; output is (pa, pb, hamming) with pa < pb.
    */
  def phashPairs(classes: DataFrame, hexCol: String,
                 maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4,
      s"4x16-bit banding is lossless only for hamming < 4 (got $maxHamming)")
    // 64-bit values split into two 32-bit halves: `conv` returns the
    // UNSIGNED decimal string, so a full 64-bit parse of a high-bit hash
    // would overflow the signed cast; 8 hex chars always fit
    val withBits = classes.select(col(hexCol).as("_ph"),
      expr(s"cast(conv(substring($hexCol, 1, 8), 16, 10) AS bigint)").as("_hi"),
      expr(s"cast(conv(substring($hexCol, 9, 8), 16, 10) AS bigint)").as("_lo"))
    val banded = withBits.select(col("_ph"), col("_hi"), col("_lo"),
        explode(expr(
          "transform(sequence(0, 3), b -> struct(b AS band, substring(_ph, b * 4 + 1, 4) AS key))"))
          .as("z"))
      .select(col("_ph"), col("_hi"), col("_lo"),
        col("z.band").as("band"), col("z.key").as("key"))
    val a = banded.select(col("band"), col("key"), col("_ph").as("pa"),
      col("_hi").as("ha"), col("_lo").as("la"))
    val b = banded.select(col("band"), col("key"), col("_ph").as("pb"),
      col("_hi").as("hb"), col("_lo").as("lb"))
    // a pair may collide on several bands; both hex hashes ride the
    // joined row, so "this is the FIRST colliding band" is a pure
    // predicate and each pair survives exactly once — the Dedup
    // firstMatchingBand trick (r16), no dedup exchange
    val firstBand = coalesce((0 until 4).map { bb =>
      when(expr(s"substring(pa, ${bb * 4 + 1}, 4) = " +
        s"substring(pb, ${bb * 4 + 1}, 4)"), lit(bb))
    }: _*)
    a.join(b, Seq("band", "key")).where(col("pa") < col("pb"))
      .where(col("band") === firstBand)
      .select(col("pa"), col("pb"),
        expr("cast(bit_count(ha ^ hb) + bit_count(la ^ lb) AS int)").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Deterministic frame sampling for (pseudo) video payloads: split the
    * payload into `frameSize`-byte frames, keep every `stride`-th. Shows
    * the explode-shaped plumbing a real frame sampler needs.
    */
  def sampleFrames(records: Dataset[MediaRecord], frameSize: Int, stride: Int): DataFrame = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      r.payload.grouped(frameSize).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (frame, idx) => (r.media_id, idx, frame.length) }
    }.toDF("media_id", "frame_idx", "frame_bytes")
  }
}
