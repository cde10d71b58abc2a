package graft.ops

/** Pure-JVM PNG *pixel* decode — the compressed complement of
  * [[BmpPixels]]: PNG's codec (zlib/DEFLATE per RFC 1950/1951) ships in
  * every JVM as `java.util.zip.Inflater`, so the multimodal path can
  * exercise a REAL compressed-image decode — signature + chunk walk with
  * CRC-32 validation, multi-IDAT zlib inflate, and per-scanline filter
  * reversal (all five PNG filter types incl. the Paeth predictor) — with
  * no external codec library. Strict recognizer per the public PNG spec
  * (RFC 2083 / W3C PNG): 8-bit greyscale (colour type 0) or truecolour
  * (2), no interlace, no palette; anything else returns None and falls to
  * the caller's fallback path rather than failing the task.
  *
  * Reference behavior anchor: the reference pipeline treats media as
  * opaque blobs; pixel statistics are an extension surface (SURVEY.md
  * multimodal plumbing), so the contract here is the PNG spec alone,
  * pinned by PngSpec round-trips and the `mm_decode_png` oracle (the
  * oracle recomputes every statistic from the generator formula, so a
  * hash match proves inflate → unfilter reproduces the pixels exactly —
  * including rows encoded with Sub/Up/Average/Paeth filters).
  */
object PngPixels {

  /** Whole-image statistics from one linear pixel walk after unfiltering:
    * dimensions, channel count (1 = grey, 3 = RGB), pixel count, exact
    * per-channel sums (grey fills sumR=sumG=sumB with the single channel).
    */
  final case class Stats(width: Int, height: Int, channels: Int, nPx: Long,
                         sumR: Long, sumG: Long, sumB: Long)

  private val Signature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def u8(b: Byte): Int = b & 0xff
  private def be32(p: Array[Byte], i: Int): Long =
    (u8(p(i)).toLong << 24) | (u8(p(i + 1)).toLong << 16) |
      (u8(p(i + 2)).toLong << 8) | u8(p(i + 3)).toLong

  /** Decode pixel statistics, or None for anything that is not a strict
    * 8-bit grey/RGB non-interlaced PNG with valid chunk CRCs and an
    * inflated size that exactly matches the IHDR geometry.
    */
  def decode(p: Array[Byte]): Option[Stats] = {
    if (p == null || p.length < 8 + 25 + 12 ||
        !Signature.indices.forall(i => p(i) == Signature(i))) return None
    // Chunk walk in Long (the WavHeaders/BmpPixels overflow lesson): a
    // declared length near 2^31 must not wrap the cursor or a bounds sum.
    var i = 8L
    var w = 0; var h = 0; var channels = 0
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    val crc = new java.util.zip.CRC32
    while (!sawIend) {
      if (i + 12 > p.length) return None
      val ii = i.toInt
      val len = be32(p, ii)
      if (len > Int.MaxValue - 12 || i + 12 + len > p.length) return None
      val typeStr = new String(p, ii + 4, 4, "US-ASCII")
      crc.reset()
      crc.update(p, ii + 4, 4 + len.toInt)
      if (crc.getValue != be32(p, ii + 8 + len.toInt)) return None
      typeStr match {
        case "IHDR" =>
          if (sawIhdr || len != 13) return None
          sawIhdr = true
          val wL = be32(p, ii + 8)
          val hL = be32(p, ii + 12)
          val bitDepth = u8(p(ii + 16))
          val colourType = u8(p(ii + 17))
          val compression = u8(p(ii + 18))
          val filterMethod = u8(p(ii + 19))
          val interlace = u8(p(ii + 20))
          if (wL < 1 || wL > 1000000 || hL < 1 || hL > 1000000 ||
              bitDepth != 8 || (colourType != 0 && colourType != 2) ||
              compression != 0 || filterMethod != 0 || interlace != 0)
            return None
          w = wL.toInt; h = hL.toInt
          channels = if (colourType == 0) 1 else 3
        case "IDAT" =>
          if (!sawIhdr) return None
          idat.write(p, ii + 8, len.toInt)
        case "IEND" => sawIend = true
        case _ => // ancillary chunks (tEXt, pHYs, …) are skipped
      }
      i += 12 + len
    }
    if (!sawIhdr) return None
    val stride = w.toLong * channels
    val rawLen = (stride + 1) * h
    if (rawLen > Int.MaxValue) return None
    val raw = new Array[Byte](rawLen.toInt)
    val inflater = new java.util.zip.Inflater()
    try {
      inflater.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, got, raw.length - got)
        if (n == 0 && inflater.needsInput()) return None // truncated stream
        got += n
      }
      // exact geometry: short data or trailing uncompressed bytes → reject
      if (got != raw.length ||
          !(inflater.finished() || inflater.inflate(new Array[Byte](1)) == 0))
        return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()
    // Unfilter in place, row by row. prev = reconstructed previous row.
    val bpp = channels // bytes per pixel at bit depth 8
    val strideI = stride.toInt
    val cur = new Array[Int](strideI)
    val prev = new Array[Int](strideI)
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      val rowOff = y * (strideI + 1)
      val filter = u8(raw(rowOff))
      if (filter > 4) return None
      var x = 0
      while (x < strideI) {
        val f = u8(raw(rowOff + 1 + x))
        val a = if (x >= bpp) cur(x - bpp) else 0 // left
        val b = prev(x) // up
        val c = if (x >= bpp) prev(x - bpp) else 0 // up-left
        val recon = filter match {
          case 0 => f
          case 1 => f + a
          case 2 => f + b
          case 3 => f + ((a + b) >> 1)
          case 4 => // Paeth predictor
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b)
            val pc = math.abs(pp - c)
            f + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        cur(x) = recon & 0xff
        x += 1
      }
      // channel sums from the reconstructed row
      var j = 0
      while (j < strideI) {
        if (channels == 3) { sr += cur(j); sg += cur(j + 1); sb += cur(j + 2); j += 3 }
        else { sr += cur(j); j += 1 }
      }
      System.arraycopy(cur, 0, prev, 0, strideI)
      y += 1
    }
    if (channels == 1) { sg = sr; sb = sr }
    Some(Stats(w, h, channels, w.toLong * h, sr, sg, sb))
  }

  /** Deterministic truecolour PNG builder for fixtures/specs/oracle
    * queries: `decode(pngBytes(w, h, f))` reproduces f's pixel sums by
    * construction. Rows are filtered with type `y % 5`, so a round-trip
    * exercises every filter (incl. Paeth) — not just the trivial None
    * path — and the payload goes through REAL zlib compression.
    */
  def pngBytes(w: Int, h: Int, f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0, s"pngBytes needs positive dims, got ${w}x$h")
    val stride = w * 3
    val raw = new Array[Byte]((stride + 1) * h)
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride)
    for (y <- 0 until h) {
      for (x <- 0 until w) {
        val (r, g, b) = f(x, y)
        cur(x * 3) = r & 0xff; cur(x * 3 + 1) = g & 0xff; cur(x * 3 + 2) = b & 0xff
      }
      val filter = y % 5
      raw(y * (stride + 1)) = filter.toByte
      for (x <- 0 until stride) {
        val a = if (x >= 3) cur(x - 3) else 0
        val b = if (y > 0) prev(x) else 0
        val c = if (x >= 3 && y > 0) prev(x - 3) else 0
        val pred = filter match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 =>
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b)
            val pc = math.abs(pp - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw(y * (stride + 1) + 1 + x) = ((cur(x) - pred) & 0xff).toByte
      }
      System.arraycopy(cur, 0, prev, 0, stride)
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zBuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zBuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    def chunk(typeStr: String, data: Array[Byte]): Unit = {
      def w32(v: Long): Unit =
        (3 to 0 by -1).foreach(s => out.write(((v >> (8 * s)) & 0xff).toInt))
      w32(data.length.toLong)
      val t = typeStr.getBytes("US-ASCII")
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      w32(crc.getValue)
    }
    val ihdr = new Array[Byte](13)
    def be(v: Int, off: Int): Unit =
      (0 until 4).foreach(s => ihdr(off + s) = ((v >> (8 * (3 - s))) & 0xff).toByte)
    be(w, 0); be(h, 4)
    ihdr(8) = 8; ihdr(9) = 2; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    chunk("IHDR", ihdr)
    // split IDAT so the multi-chunk concatenation path is exercised
    val z = zBuf.toByteArray
    val half = math.max(1, z.length / 2)
    chunk("IDAT", z.take(half))
    if (z.length > half) chunk("IDAT", z.drop(half))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}
