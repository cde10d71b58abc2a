package graft.ops

/** Pure-JVM BMP *pixel* decode — the one image format whose uncompressed
  * payload needs no codec library, so the multimodal path can exercise a
  * REAL end-to-end pixel walk (not just header parsing) in this
  * environment. Supports the common Windows layout per the public format:
  * BITMAPFILEHEADER (14 bytes, "BM") + BITMAPINFOHEADER (≥ 40 bytes),
  * 24 bits per pixel, BI_RGB (no compression), rows padded to 4-byte
  * multiples, bottom-up (positive height) or top-down (negative height)
  * row order. Anything else returns None — malformed payloads fall to the
  * caller's fallback path, they don't fail the task.
  *
  * Reference behavior anchor: the reference pipeline treats media as
  * opaque blobs; pixel statistics are an extension surface (SURVEY.md
  * multimodal plumbing), so the contract here is defined by the BMP spec
  * alone and pinned by BmpSpec + the `mm_decode_pixels` oracle (the
  * oracle recomputes every statistic arithmetically from the generator
  * formula, so a hash match proves decode(encode(f)) == f pixel-exactly).
  */
object BmpPixels {

  /** Whole-image statistics from one linear pixel walk: dimensions, pixel
    * count, and exact per-channel sums (order-free, so row order — bottom-
    * up vs top-down — cannot affect them).
    */
  final case class Stats(width: Int, height: Int, nPx: Long,
                         sumR: Long, sumG: Long, sumB: Long)

  private def u8(b: Byte): Int = b & 0xff
  private def le16(p: Array[Byte], i: Int): Int = u8(p(i)) | (u8(p(i + 1)) << 8)
  private def le32(p: Array[Byte], i: Int): Long =
    u8(p(i)).toLong | (u8(p(i + 1)).toLong << 8) |
      (u8(p(i + 2)).toLong << 16) | (u8(p(i + 3)).toLong << 24)

  /** Strict recognizer: enough header to identify a decodable 24-bpp
    * BI_RGB stream. Deliberately conservative — a text payload starting
    * with "BM" must not be misread as an image, so every fixed field is
    * checked before any pixel math.
    */
  def dimensions(p: Array[Byte]): Option[(Int, Int)] =
    header(p).map { case (_, w, h, _) => (w, h) }

  /** (dataOffset, width, |height|, topDown) if the payload is a decodable
    * BMP; None otherwise.
    */
  private def header(p: Array[Byte]): Option[(Int, Int, Int, Boolean)] = {
    if (p == null || p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    val off = le32(p, 10)
    val hdrSize = le32(p, 14)
    val w = le32(p, 18).toInt
    val hRaw = le32(p, 22).toInt
    val planes = le16(p, 26)
    val bpp = le16(p, 28)
    val compression = le32(p, 30)
    if (hdrSize < 40 || w <= 0 || hRaw == 0 || hRaw == Int.MinValue ||
        planes != 1 || bpp != 24 || compression != 0) return None
    val h = math.abs(hRaw)
    // stride math in Long: a crafted width near 2^31 overflows Int
    // (negative rowBytes would pass the bounds check and decode garbage)
    val rowBytesL = ((w.toLong * 3 + 3) / 4) * 4
    if (off < 54 || off + rowBytesL * h > p.length) return None
    Some((off.toInt, w, h, hRaw < 0))
  }

  /** Decode pixel statistics, or None for anything that is not a strict
    * 24-bpp BI_RGB BMP. One linear pass over the pixel array; padding
    * bytes are skipped per row, never summed.
    */
  def decode(p: Array[Byte]): Option[Stats] = header(p).map { case (off, w, h, _) =>
    val rowBytes = ((w * 3 + 3) / 4) * 4
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var i = off + y * rowBytes
      val end = i + w * 3
      while (i < end) {
        // stored channel order is B, G, R
        sb += u8(p(i)); sg += u8(p(i + 1)); sr += u8(p(i + 2))
        i += 3
      }
      y += 1
    }
    Stats(w, h, w.toLong * h, sr, sg, sb)
  }

  /** Average-hash (aHash) over the decoded pixels: the image is covered
    * by an 8×8 block grid (block of pixel (x, y) = (x·8 div w, y·8 div h)
    * in LOGICAL top-down coordinates — row order is normalized first, so
    * bottom-up and top-down encodings of the same image hash identically),
    * each block's bit is 1 iff its mean luminance (r+g+b) exceeds the
    * whole-image mean. The comparison is the exact integer cross-multiply
    * `blockSum · nPx > totalSum · blockCnt` — no float mean, so the oracle
    * reproduces every bit arithmetically from the generator formula.
    * Output: 16 lowercase hex chars, one byte per block row, bit x within
    * row byte (empty blocks of tiny images hash to 0). None for anything
    * [[decode]] rejects. Exact to images of ~10^8 pixels (the cross-
    * multiply peaks at 765·nPx²).
    */
  def aHashHex(p: Array[Byte]): Option[String] = header(p).map {
    case (off, w, h, topDown) =>
      val rowBytes = ((w * 3 + 3) / 4) * 4
      val bSum = Array.ofDim[Long](8, 8)
      val bCnt = Array.ofDim[Long](8, 8)
      var total = 0L
      var row = 0
      while (row < h) {
        val y = if (topDown) row else h - 1 - row
        val by = y * 8 / h
        var x = 0
        var i = off + row * rowBytes
        while (x < w) {
          val lum = u8(p(i)) + u8(p(i + 1)) + u8(p(i + 2))
          val bx = x * 8 / w
          bSum(by)(bx) += lum
          bCnt(by)(bx) += 1
          total += lum
          x += 1
          i += 3
        }
        row += 1
      }
      val nPx = w.toLong * h
      val sb = new StringBuilder(16)
      var by = 0
      while (by < 8) {
        var rowByte = 0
        var bx = 0
        while (bx < 8) {
          if (bSum(by)(bx) * nPx > total * bCnt(by)(bx)) rowByte |= 1 << bx
          bx += 1
        }
        sb.append(f"$rowByte%02x")
        by += 1
      }
      sb.toString
  }

  /** Deterministic builder for fixtures/specs: a bottom-up 24-bpp BI_RGB
    * BMP whose logical pixel (x, y) — x right, y DOWN from the top-left,
    * the image convention — has channels `pix(x, y) = (r, g, b)`.
    * `decode(bmpBytes(w, h, f))` reproduces the per-channel sums of `f`
    * by construction; values are masked to a byte.
    */
  def bmpBytes(w: Int, h: Int, pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0, s"bmpBytes needs positive dims, got ${w}x$h")
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowBytes * h
    val b = new Array[Byte](size)
    def w16(i: Int, v: Int): Unit = { b(i) = v.toByte; b(i + 1) = (v >> 8).toByte }
    def w32(i: Int, v: Int): Unit = {
      b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'
    w32(2, size)       // file size
    w32(10, 54)        // pixel data offset
    w32(14, 40)        // BITMAPINFOHEADER size
    w32(18, w)
    w32(22, h)         // positive → bottom-up storage
    w16(26, 1)         // planes
    w16(28, 24)        // bpp
    w32(30, 0)         // BI_RGB
    w32(34, rowBytes * h)
    var y = 0
    while (y < h) {
      // logical row y (from top) is stored at file row h-1-y (bottom-up)
      val base = 54 + (h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        val (r, g, bl) = pix(x, y)
        val i = base + x * 3
        b(i) = bl.toByte; b(i + 1) = g.toByte; b(i + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    b
  }
}
