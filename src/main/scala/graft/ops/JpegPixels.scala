package graft.ops

/** Pure-JVM baseline JPEG *pixel* decode — the codec-bound complement of
  * [[PngPixels]]: web image corpora are overwhelmingly JPEG, so the
  * multimodal profiling path (pixel stats, pHash) needs a real JPEG
  * decode, and baseline sequential JPEG (ITU-T T.81 / ISO 10918-1, the
  * public spec) is pure-JVM feasible — huffman entropy decode, dequant,
  * 8×8 inverse DCT, 4:2:0 chroma upsampling, JFIF YCbCr→RGB — with no
  * external codec library.
  *
  * Strict recognizer, like [[PngPixels]]: 8-bit baseline SOF0 only,
  * greyscale (1 component, 1×1) or YCbCr (3 components, all 1×1 = 4:4:4
  * or Y 2×2 + chroma 1×1 = 4:2:0), optional restart markers. Anything
  * else — progressive SOF2, arithmetic coding, 12-bit precision, other
  * sampling grids, truncated or mis-stuffed entropy data, a bad marker —
  * returns None and falls to the caller's fallback path.
  *
  * ORACLE DISCIPLINE (the `mm_decode_jpeg` row): JPEG is lossy, so a
  * closed-form pixel oracle needs fixtures whose decode is EXACT. DC-only
  * blocks give that: for a constant 8×8 block of value v, the forward
  * DCT has a single coefficient F(0,0) = 8·(v−128); with quantizer
  * Q(0,0) = 8 the coded DC is exactly v−128, and the spec IDCT of a
  * DC-only block is the constant F(0,0)/8 + 128 = v — bit-exact through
  * the full general decode path (huffman magnitude categories, DC
  * prediction, byte unstuffing, restart resync, dequant, the full 64-term
  * IDCT, 4:2:0 replication, the float color transform). [[jpegBytes]]
  * synthesizes such streams; JpegSpec additionally drives nonzero AC
  * coefficients against the spec IDCT formula directly.
  *
  * The IDCT here is the spec's O(64²)-per-block double-precision sum —
  * exact and obviously-correct; a throughput deploy would swap in a
  * fixed-point AAN butterfly (pure refactor behind the same contract).
  */
object JpegPixels {

  /** Whole-image statistics from one linear pixel walk: dimensions,
    * channel count (1 = grey, 3 = YCbCr→RGB), pixel count, exact
    * per-channel sums (grey fills sumR=sumG=sumB with the single channel).
    */
  final case class Stats(width: Int, height: Int, channels: Int, nPx: Long,
                         sumR: Long, sumG: Long, sumB: Long)

  // zigzag scan position -> natural (row-major) coefficient index
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // cos((2x+1)·u·π/16) and the 1/√2 DC normalizer — the T.81 A.3.3 basis
  private val Cos: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val Cn: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  private def u8(b: Byte): Int = b & 0xff

  // ---------------------------------------------------------------- tables

  /** A huffman table: BITS (counts per code length 1..16) + HUFFVAL. */
  private final case class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // canonical decode arrays (T.81 F.2.2.3)
    val minCode: Array[Int] = new Array[Int](17)
    val maxCode: Array[Int] = Array.fill(17)(-1)
    val valPtr: Array[Int] = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var len = 1
      while (len <= 16) {
        valPtr(len) = k
        minCode(len) = code
        code += bits(len - 1); k += bits(len - 1)
        maxCode(len) = if (bits(len - 1) > 0) code - 1 else -1
        code <<= 1
        len += 1
      }
    }
    // canonical encode map value -> (code, length) (T.81 C.2)
    lazy val enc: Map[Int, (Int, Int)] = {
      var code = 0; var k = 0
      val m = scala.collection.mutable.Map.empty[Int, (Int, Int)]
      var len = 1
      while (len <= 16) {
        var i = 0
        while (i < bits(len - 1)) { m(vals(k)) = (code, len); code += 1; k += 1; i += 1 }
        code <<= 1
        len += 1
      }
      m.toMap
    }
  }

  // the T.81 Annex K typical tables — embedded by [[jpegBytes]]; the
  // decoder reads whatever tables the DHT segments carry, so correctness
  // never depends on these specific values
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).toArray
  private val DcChrBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChrBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChrVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  // ---------------------------------------------------------------- decode

  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    var bad = false
    /** next entropy bit, honoring 0xFF00 byte stuffing; any other 0xFF
      * sequence mid-entropy marks the stream bad (strict). */
    def bit(): Int = {
      if (cnt == 0) {
        if (pos >= p.length) { bad = true; return 0 }
        var b = u8(p(pos)); pos += 1
        if (b == 0xff) {
          if (pos >= p.length || u8(p(pos)) != 0x00) { bad = true; return 0 }
          pos += 1
          b = 0xff
        }
        buf = b; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** skip legal inter-marker noise: 0xFF fill bytes and a stuffed
      * 0xFF00 pad byte a foreign encoder may leave before a marker. */
    private def skipFill(): Int = {
      var i = pos
      var go = true
      while (go && i + 1 < p.length) {
        if (u8(p(i)) == 0xff && u8(p(i + 1)) == 0x00) i += 2
        else if (u8(p(i)) == 0xff && u8(p(i + 1)) == 0xff) i += 1
        else go = false
      }
      i
    }
    /** byte-align and consume an expected RSTn marker (restart resync). */
    def restart(n: Int): Boolean = {
      cnt = 0
      val i = skipFill()
      val ok = i + 2 <= p.length &&
        u8(p(i)) == 0xff && u8(p(i + 1)) == (0xd0 + (n % 8))
      if (ok) pos = i + 2
      ok
    }
    /** byte-align and check the stream ends with EOI (optional fill). */
    def eoi(): Boolean = {
      cnt = 0
      val i = skipFill()
      i + 2 <= p.length && u8(p(i)) == 0xff && u8(p(i + 1)) == 0xd9
    }
    /** byte-align and return the next marker-candidate position — the
      * multi-scan (progressive) walk resumes its marker loop here. */
    def markerPos: Int = { cnt = 0; skipFill() }
  }

  private def decodeHuff(r: BitReader, t: HuffTable): Int = {
    var code = r.bit()
    var len = 1
    while (len <= 16 && code > t.maxCode(len)) {
      code = (code << 1) | r.bit()
      len += 1
    }
    if (len > 16 || r.bad) { r.bad = true; return -1 }
    val idx = t.valPtr(len) + code - t.minCode(len)
    if (idx < 0 || idx >= t.vals.length) { r.bad = true; return -1 }
    t.vals(idx)
  }

  /** T.81 F.2.1.2 EXTEND: map an s-bit magnitude to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Component(id: Int, hs: Int, vs: Int, tq: Int,
                                     var td: Int = 0, var ta: Int = 0)

  /** A fully-decoded image: cropped dims + exact per-pixel RGB access
    * (grey replicates the single channel). Internal surface shared by
    * [[decode]] (whole-image sums) and [[aHashHex]] (block means).
    */
  private final case class Parsed(w: Int, h: Int, channels: Int,
      planes: Array[Array[Int]], planeW: Array[Int],
      sx1: Int, sy1: Int, sx2: Int, sy2: Int) {
    def rgb(x: Int, y: Int, out: Array[Int]): Unit = {
      val yy = planes(0)(y * planeW(0) + x)
      if (channels == 1) { out(0) = yy; out(1) = yy; out(2) = yy }
      else {
        val cb = planes(1)((y / sy1) * planeW(1) + x / sx1)
        val cr = planes(2)((y / sy2) * planeW(2) + x / sx2)
        def cl(d: Double): Int = {
          val v = math.round(d).toInt
          if (v < 0) 0 else if (v > 255) 255 else v
        }
        out(0) = cl(yy + 1.402 * (cr - 128))
        out(1) = cl(yy - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
        out(2) = cl(yy + 1.772 * (cb - 128))
      }
    }
  }

  /** SOF classification WITHOUT a decode — the corpus-coverage probe
    * (r15 verdict #6: measure what fraction of a mixed corpus each
    * decode path accepts before trusting the pixel stats). Walks the
    * marker stream to the first SOFn: Some("baseline") for SOF0,
    * Some("progressive") for SOF2, Some("other-sof") for the rest
    * (extended sequential, arithmetic, lossless...), None when the
    * payload is not marker-structured JPEG at all.
    */
  def sofKind(p: Array[Byte]): Option[String] = {
    if (p == null || p.length < 4 ||
        u8(p(0)) != 0xff || u8(p(1)) != 0xd8) return None
    var i = 2
    while (i + 4 <= p.length && u8(p(i)) == 0xff) {
      val m = u8(p(i + 1))
      if (m == 0xc0) return Some("baseline")
      if (m == 0xc2) return Some("progressive")
      if ((m >= 0xc1 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc)
        return Some("other-sof")
      if (m == 0xda || m == 0xd9) return None // SOS/EOI before any SOF
      val len = (u8(p(i + 2)) << 8) | u8(p(i + 3))
      if (len < 2) return None
      i += 2 + len
    }
    None
  }

  /** Decode pixel statistics, or None for anything that is not a strict
    * 8-bit baseline grey / 4:4:4 / 4:2:0 JFIF-style JPEG.
    */
  def decode(p: Array[Byte]): Option[Stats] = parse(p).map { d =>
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    val px = new Array[Int](3)
    var y0 = 0
    while (y0 < d.h) {
      var x0 = 0
      while (x0 < d.w) {
        d.rgb(x0, y0, px)
        sumR += px(0); sumG += px(1); sumB += px(2)
        x0 += 1
      }
      y0 += 1
    }
    Stats(d.w, d.h, d.channels, d.w.toLong * d.h, sumR, sumG, sumB)
  }

  /** Perceptual average-hash over the decoded pixels — the same 8×8
    * block / integer-cross-multiply construction as
    * [[BmpPixels.aHashHex]] (luminance proxy R+G+B; grey = 3× the
    * channel), so a JPEG and a BMP of the SAME pixels land on the SAME
    * hash — re-encoding an image across formats is exactly the
    * near-duplicate case the pHash key exists to catch.
    */
  def aHashHex(p: Array[Byte]): Option[String] = aHash(p).map(_._3)

  /** (width, height, aHash hex) from ONE parse + one pixel walk — the
    * perceptualHashes surface (separate decode-for-dims + aHashHex calls
    * paid two full decodes per record, r15 review).
    */
  def aHash(p: Array[Byte]): Option[(Int, Int, String)] = parse(p).map { d =>
    val bSum = Array.ofDim[Long](8, 8)
    val bCnt = Array.ofDim[Long](8, 8)
    var total = 0L
    val px = new Array[Int](3)
    var y0 = 0
    while (y0 < d.h) {
      val by = y0 * 8 / d.h
      var x0 = 0
      while (x0 < d.w) {
        d.rgb(x0, y0, px)
        val lum = px(0) + px(1) + px(2)
        bSum(by)(x0 * 8 / d.w) += lum
        bCnt(by)(x0 * 8 / d.w) += 1
        total += lum
        x0 += 1
      }
      y0 += 1
    }
    val nPx = d.w.toLong * d.h
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
    (d.w, d.h, sb.toString)
  }

  private def parse(p: Array[Byte]): Option[Parsed] = {
    if (p == null || p.length < 4 ||
        u8(p(0)) != 0xff || u8(p(1)) != 0xd8) return None
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var dri = 0
    var i = 2
    var sosAt = -1
    while (sosAt < 0) {
      if (i + 4 > p.length || u8(p(i)) != 0xff) return None
      val m = u8(p(i + 1))
      if (m == 0xd8 || (m >= 0xd0 && m <= 0xd9)) return None // stray SOI/RST/EOI
      val len = (u8(p(i + 2)) << 8) | u8(p(i + 3))
      if (len < 2 || i + 2 + len > p.length) return None
      val seg = i + 4
      val segEnd = i + 2 + len
      m match {
        case 0xdb => // DQT: one or more (PqTq, 64 bytes) entries
          var j = seg
          while (j < segEnd) {
            if (j + 65 > segEnd) return None
            val pq = u8(p(j)) >> 4; val tq = u8(p(j)) & 15
            if (pq != 0 || tq > 3) return None // 8-bit tables only
            qt(tq) = Array.tabulate(64)(k => u8(p(j + 1 + k)))
            j += 65
          }
        case 0xc4 => // DHT: one or more (TcTh, bits, vals) entries
          var j = seg
          while (j < segEnd) {
            if (j + 17 > segEnd) return None
            val tc = u8(p(j)) >> 4; val th = u8(p(j)) & 15
            if (tc > 1 || th > 3) return None
            val bits = Array.tabulate(16)(k => u8(p(j + 1 + k)))
            val n = bits.sum
            if (j + 17 + n > segEnd || n > 256) return None
            val vals = Array.tabulate(n)(k => u8(p(j + 17 + k)))
            val t = HuffTable(bits, vals)
            if (tc == 0) dcT(th) = t else acT(th) = t
            j += 17 + n
          }
        case 0xc0 => // SOF0 baseline
          if (u8(p(seg)) != 8) return None
          h = (u8(p(seg + 1)) << 8) | u8(p(seg + 2))
          w = (u8(p(seg + 3)) << 8) | u8(p(seg + 4))
          val nc = u8(p(seg + 5))
          if (w == 0 || h == 0 || (nc != 1 && nc != 3) ||
              seg + 6 + 3 * nc > segEnd) return None
          comps = Array.tabulate(nc) { c =>
            val o = seg + 6 + 3 * c
            Component(u8(p(o)), u8(p(o + 1)) >> 4, u8(p(o + 1)) & 15,
              u8(p(o + 2)))
          }
          // supported grids: grey 1×1; color all-1×1 (4:4:4) or Y 2×2 +
          // chroma 1×1 (4:2:0)
          val ok =
            if (nc == 1) comps(0).hs == 1 && comps(0).vs == 1
            else {
              val c444 = comps.forall(c => c.hs == 1 && c.vs == 1)
              val c420 = comps(0).hs == 2 && comps(0).vs == 2 &&
                comps.tail.forall(c => c.hs == 1 && c.vs == 1)
              c444 || c420
            }
          if (!ok) return None
        case 0xc2 => // SOF2 progressive: dedicated multi-scan walk (r16)
          return parseProgressive(p)
        case x if x >= 0xc1 && x <= 0xcf => // 0xc0/0xc2/0xc4 matched above
          return None // other non-baseline SOFs (extended seq, arithmetic, …)
        case 0xdd => // DRI
          if (len != 4) return None
          dri = (u8(p(seg)) << 8) | u8(p(seg + 1))
        case 0xda => // SOS
          if (comps == null) return None
          val ns = u8(p(seg))
          if (ns != comps.length || seg + 1 + 2 * ns + 3 > segEnd) return None
          var c = 0
          while (c < ns) {
            // scan components must be the frame components IN FRAME ORDER
            // (review r15): the MCU loop reads entropy data in SOF order,
            // so a reordered (or duplicated) SOS silently swaps planes —
            // out-of-contract streams must return None, not wrong pixels
            if (u8(p(seg + 1 + 2 * c)) != comps(c).id) return None
            comps(c).td = u8(p(seg + 2 + 2 * c)) >> 4
            comps(c).ta = u8(p(seg + 2 + 2 * c)) & 15
            c += 1
          }
          // baseline spectral selection 0..63, no successive approximation
          if (u8(p(segEnd - 3)) != 0 || u8(p(segEnd - 2)) != 63 ||
              u8(p(segEnd - 1)) != 0) return None
          sosAt = segEnd
        case _ => () // APPn / COM / others: skip
      }
      i = segEnd
    }
    comps.foreach { c =>
      if (c.tq > 3 || qt(c.tq) == null) return None
      // td/ta are 4-bit stream values; baseline only defines slots 0-3
      // (fuzz-caught: a corrupt SOS byte indexed past the table arrays)
      if (c.td > 3 || c.ta > 3) return None
      if (dcT(c.td) == null || acT(c.ta) == null) return None
    }
    // allocation guard: the planes are sized from SOF's CLAIMED geometry
    // before a single entropy bit validates it — a corrupt (or hostile)
    // dimension field must not drive a multi-GB allocation. 64 MPx
    // covers any real crawl image; larger claims fall to the caller's
    // fallback like every other out-of-contract stream.
    if (w.toLong * h > (1L << 26)) return None

    val hMax = comps.map(_.hs).max
    val vMax = comps.map(_.vs).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    // per-component padded plane
    val planeW = comps.map(c => mcusX * c.hs * 8)
    val planeH = comps.map(c => mcusY * c.vs * 8)
    // TOTAL-allocation guard (advice r15): the pixel cap alone still lets
    // a crafted 4:4:4 header demand three full-resolution Int planes
    // (~800 MB) before any entropy byte validates — and executor tasks
    // decode concurrently. Bound the summed PADDED plane elements so one
    // decode never allocates more than 256 MB of planes; larger claims
    // fall to the caller's fallback like every other out-of-contract
    // stream (a legit 3-plane 4:4:4 image stays accepted up to ~21 MPx).
    val totalPlaneElems = comps.indices.map(c => planeW(c).toLong * planeH(c)).sum
    if (totalPlaneElems > (1L << 26)) return None
    val planes = comps.indices.map(c => new Array[Int](planeW(c) * planeH(c))).toArray
    val pred = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val r = new BitReader(p, sosAt)
    var rstN = 0
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (dri > 0 && mcu > 0 && mcu % dri == 0) {
          if (!r.restart(rstN)) return None
          rstN += 1
          java.util.Arrays.fill(pred, 0)
        }
        var c = 0
        while (c < comps.length) {
          val comp = comps(c)
          val q = qt(comp.tq)
          var by = 0
          while (by < comp.vs) {
            var bx = 0
            while (bx < comp.hs) {
              java.util.Arrays.fill(coef, 0)
              // DC
              val s = decodeHuff(r, dcT(comp.td))
              if (r.bad || s < 0 || s > 11) return None
              val diff = extend(r.bits(s), s)
              pred(c) += diff
              coef(0) = pred(c) * q(0)
              // AC run-length
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = decodeHuff(r, acT(comp.ta))
                if (r.bad || rs < 0) return None
                val run = rs >> 4; val sz = rs & 15
                if (sz == 0) {
                  // T.81 F.2.2.2: size 0 is only defined with run 0 (EOB)
                  // or run 15 (ZRL); run 1-14 is out-of-contract and must
                  // reject, not silently end the block (strict-recognizer
                  // rule — advice r15)
                  if (run == 15) k += 16
                  else if (run == 0) eob = true
                  else return None
                } else {
                  k += run
                  if (k > 63) return None
                  coef(Zigzag(k)) = extend(r.bits(sz), sz) * q(k)
                  k += 1
                }
              }
              if (r.bad) return None
              // spec IDCT + level shift + clamp, into the padded plane
              val ox = (mx * comp.hs + bx) * 8
              val oy = (my * comp.vs + by) * 8
              var y0 = 0
              while (y0 < 8) {
                var x0 = 0
                while (x0 < 8) {
                  var acc = 0.0
                  var u = 0
                  while (u < 8) {
                    var v = 0
                    while (v < 8) {
                      val f = coef(v * 8 + u)
                      if (f != 0)
                        acc += Cn(u) * Cn(v) * f * Cos(x0)(u) * Cos(y0)(v)
                      v += 1
                    }
                    u += 1
                  }
                  val px = math.round(acc / 4 + 128).toInt
                  planes(c)((oy + y0) * planeW(c) + ox + x0) =
                    if (px < 0) 0 else if (px > 255) 255 else px
                  x0 += 1
                }
                y0 += 1
              }
              bx += 1
            }
            by += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    if (!r.eoi()) return None

    if (comps.length == 1)
      Some(Parsed(w, h, 1, planes, planeW, 1, 1, 1, 1))
    else
      Some(Parsed(w, h, 3, planes, planeW,
        hMax / comps(1).hs, vMax / comps(1).vs,
        hMax / comps(2).hs, vMax / comps(2).vs))
  }

  // ---------------------------------------------------- progressive decode

  /** SOF2 progressive decode (r16) — full spectral-selection AND
    * successive-approximation support: interleaved/non-interleaved DC
    * first + refinement scans, per-component AC first + refinement scans
    * with EOB runs and ZRL, DHT redefinition between scans. Strictness
    * model: per-coefficient Al coverage is TRACKED — a first pass needs
    * virgin coverage, a refinement needs Ah == current level, and at EOI
    * every coefficient must sit at Al = 0 (or never have been scanned,
    * which IS exactly zero) — so an accepted stream decodes EXACTLY, and
    * a truncated progression (coefficients stranded at Al > 0, i.e. an
    * approximate image) rejects rather than emitting almost-right
    * pixels. Out of subset: DRI/restarts inside progressive (rejected),
    * DQT redefinition after the first scan, arithmetic coding, 12-bit.
    *
    * Successive-approximation asymmetry implemented per T.81 G.1.2: the
    * DC point transform is an ARITHMETIC shift (refinement bit ORs into
    * place — two's complement makes v|bit ≡ v + bit on the zeroed low
    * bit), while AC is SIGN-MAGNITUDE (first pass stores
    * sgn·(|v|>>Al)<<Al; correction bits grow the magnitude toward the
    * sign).
    */
  private def parseProgressive(p: Array[Byte]): Option[Parsed] = {
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[HuffTable](4)
    val acT = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0; var h = 0
    var i = 2
    var coefs: Array[Array[Int]] = null
    var blocksW: Array[Int] = null
    var blocksH: Array[Int] = null
    var compBW: Array[Int] = null
    var compBH: Array[Int] = null
    var hMax = 0; var vMax = 0; var mcusX = 0; var mcusY = 0
    var covAl: Array[Array[Int]] = null
    var anyScan = false
    var sawEoi = false

    while (!sawEoi) {
      if (i + 2 > p.length || u8(p(i)) != 0xff) return None
      val m = u8(p(i + 1))
      if (m == 0xd9) { sawEoi = true }
      else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) return None
      else {
        if (i + 4 > p.length) return None
        val len = (u8(p(i + 2)) << 8) | u8(p(i + 3))
        if (len < 2 || i + 2 + len > p.length) return None
        val seg = i + 4
        val segEnd = i + 2 + len
        var nextI = segEnd
        m match {
          case 0xdb =>
            if (anyScan) return None // strict: tables fixed once scanning starts
            var j = seg
            while (j < segEnd) {
              if (j + 65 > segEnd) return None
              val pq = u8(p(j)) >> 4; val tq = u8(p(j)) & 15
              if (pq != 0 || tq > 3) return None
              qt(tq) = Array.tabulate(64)(k => u8(p(j + 1 + k)))
              j += 65
            }
          case 0xc4 => // DHT: legal between scans in progressive
            var j = seg
            while (j < segEnd) {
              if (j + 17 > segEnd) return None
              val tc = u8(p(j)) >> 4; val th = u8(p(j)) & 15
              if (tc > 1 || th > 3) return None
              val bits = Array.tabulate(16)(k => u8(p(j + 1 + k)))
              val n = bits.sum
              if (j + 17 + n > segEnd || n > 256) return None
              val vals = Array.tabulate(n)(k => u8(p(j + 17 + k)))
              val t = HuffTable(bits, vals)
              if (tc == 0) dcT(th) = t else acT(th) = t
              j += 17 + n
            }
          case 0xc2 =>
            if (comps != null) return None
            if (u8(p(seg)) != 8) return None
            h = (u8(p(seg + 1)) << 8) | u8(p(seg + 2))
            w = (u8(p(seg + 3)) << 8) | u8(p(seg + 4))
            val nc = u8(p(seg + 5))
            if (w == 0 || h == 0 || (nc != 1 && nc != 3) ||
                seg + 6 + 3 * nc > segEnd) return None
            comps = Array.tabulate(nc) { c =>
              val o = seg + 6 + 3 * c
              Component(u8(p(o)), u8(p(o + 1)) >> 4, u8(p(o + 1)) & 15,
                u8(p(o + 2)))
            }
            val ok =
              if (nc == 1) comps(0).hs == 1 && comps(0).vs == 1
              else {
                val c444 = comps.forall(c => c.hs == 1 && c.vs == 1)
                val c420 = comps(0).hs == 2 && comps(0).vs == 2 &&
                  comps.tail.forall(c => c.hs == 1 && c.vs == 1)
                c444 || c420
              }
            if (!ok) return None
            if (w.toLong * h > (1L << 26)) return None
            hMax = comps.map(_.hs).max
            vMax = comps.map(_.vs).max
            mcusX = (w + 8 * hMax - 1) / (8 * hMax)
            mcusY = (h + 8 * vMax - 1) / (8 * vMax)
            blocksW = comps.map(c => mcusX * c.hs)
            blocksH = comps.map(c => mcusY * c.vs)
            compBW = comps.map(c => ((w * c.hs + hMax - 1) / hMax + 7) / 8)
            compBH = comps.map(c => ((h * c.vs + vMax - 1) / vMax + 7) / 8)
            // progressive holds coef arrays AND planes (2 buffers) — the
            // total-allocation bound is half the baseline's
            val totalCoefElems = comps.indices
              .map(c => blocksW(c).toLong * blocksH(c) * 64).sum
            if (totalCoefElems > (1L << 25)) return None
            coefs = comps.indices
              .map(c => new Array[Int](blocksW(c) * blocksH(c) * 64)).toArray
            covAl = Array.fill(comps.length)(Array.fill(64)(-1))
          case x if (x >= 0xc0 && x <= 0xcf) && x != 0xc2 && x != 0xc4 =>
            return None // mixed / other SOF
          case 0xdd =>
            if (len != 4) return None
            // restarts inside progressive scans: out of subset (strict)
            if (((u8(p(seg)) << 8) | u8(p(seg + 1))) != 0) return None
          case 0xda =>
            if (comps == null) return None
            val ns = u8(p(seg))
            if (ns < 1 || ns > comps.length ||
                seg + 1 + 2 * ns + 3 > segEnd) return None
            val scomps = new Array[Int](ns)
            var c = 0; var prev = -1
            while (c < ns) {
              val cid = u8(p(seg + 1 + 2 * c))
              val ci = comps.indexWhere(_.id == cid)
              if (ci < 0 || ci <= prev) return None
              prev = ci
              comps(ci).td = u8(p(seg + 2 + 2 * c)) >> 4
              comps(ci).ta = u8(p(seg + 2 + 2 * c)) & 15
              if (comps(ci).td > 3 || comps(ci).ta > 3) return None
              scomps(c) = ci
              c += 1
            }
            val ss = u8(p(segEnd - 3)); val se = u8(p(segEnd - 2))
            val ah = u8(p(segEnd - 1)) >> 4; val al = u8(p(segEnd - 1)) & 15
            if (ss == 0) { if (se != 0) return None }
            else if (ns != 1 || se < ss || se > 63) return None
            if (ah != 0 && ah != al + 1) return None
            if (al > 13) return None
            // DC scan must precede a component's AC scans
            if (ss > 0 && covAl(scomps(0))(0) < 0) return None
            // coverage transition: first pass on virgin band, refinement
            // exactly one level down
            var k = ss
            while (k <= se) {
              var sI = 0
              while (sI < ns) {
                val cur = covAl(scomps(sI))(k)
                if (ah == 0) { if (cur != -1) return None }
                else if (cur != ah) return None
                covAl(scomps(sI))(k) = al
                sI += 1
              }
              k += 1
            }
            // table presence (DC refinement scans read raw bits only)
            if (ss == 0 && ah == 0) {
              var sI = 0
              while (sI < ns) {
                if (dcT(comps(scomps(sI)).td) == null) return None
                sI += 1
              }
            }
            if (ss > 0 && acT(comps(scomps(0)).ta) == null) return None
            val r = new BitReader(p, segEnd)
            if (!decodeProgScan(r, comps, scomps, coefs, blocksW, compBW,
                compBH, mcusX, mcusY, dcT, acT, ss, se, ah, al)) return None
            anyScan = true
            nextI = r.markerPos
          case _ => ()
        }
        i = nextI
      }
      if (!sawEoi && i >= p.length) return None
    }
    if (comps == null || !anyScan) return None
    // completeness: DC delivered to full precision; AC either complete
    // or never scanned (= exactly zero)
    var ci = 0
    while (ci < comps.length) {
      if (covAl(ci)(0) != 0) return None
      var k = 1
      while (k < 64) {
        val a = covAl(ci)(k)
        if (a != 0 && a != -1) return None
        k += 1
      }
      val comp = comps(ci)
      if (comp.tq > 3 || qt(comp.tq) == null) return None
      ci += 1
    }
    // dequant + IDCT every block into the padded planes
    val planeW = comps.indices.map(c => blocksW(c) * 8).toArray
    val planes = comps.indices
      .map(c => new Array[Int](blocksW(c) * 8 * blocksH(c) * 8)).toArray
    val coef = new Array[Int](64)
    ci = 0
    while (ci < comps.length) {
      val q = qt(comps(ci).tq)
      var by = 0
      while (by < blocksH(ci)) {
        var bx = 0
        while (bx < blocksW(ci)) {
          val base = (by * blocksW(ci) + bx) * 64
          var k = 0
          while (k < 64) {
            coef(Zigzag(k)) = coefs(ci)(base + Zigzag(k)) * q(k)
            k += 1
          }
          val ox = bx * 8; val oy = by * 8
          var y0 = 0
          while (y0 < 8) {
            var x0 = 0
            while (x0 < 8) {
              var acc = 0.0
              var u = 0
              while (u < 8) {
                var v = 0
                while (v < 8) {
                  val f = coef(v * 8 + u)
                  if (f != 0)
                    acc += Cn(u) * Cn(v) * f * Cos(x0)(u) * Cos(y0)(v)
                  v += 1
                }
                u += 1
              }
              val px = math.round(acc / 4 + 128).toInt
              planes(ci)((oy + y0) * planeW(ci) + ox + x0) =
                if (px < 0) 0 else if (px > 255) 255 else px
              x0 += 1
            }
            y0 += 1
          }
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    if (comps.length == 1)
      Some(Parsed(w, h, 1, planes, planeW, 1, 1, 1, 1))
    else
      Some(Parsed(w, h, 3, planes, planeW,
        hMax / comps(1).hs, vMax / comps(1).vs,
        hMax / comps(2).hs, vMax / comps(2).vs))
  }

  /** One progressive scan's entropy data into the coefficient planes.
    * Returns false on any out-of-contract condition.
    */
  private def decodeProgScan(r: BitReader, comps: Array[Component],
      scomps: Array[Int], coefs: Array[Array[Int]], blocksW: Array[Int],
      compBW: Array[Int], compBH: Array[Int], mcusX: Int, mcusY: Int,
      dcT: Array[HuffTable], acT: Array[HuffTable],
      ss: Int, se: Int, ah: Int, al: Int): Boolean = {
    if (ss == 0) {
      val pred = new Array[Int](comps.length)
      def dcUnit(ci: Int, blockIdx: Int): Boolean = {
        val base = blockIdx * 64
        if (ah == 0) {
          val s = decodeHuff(r, dcT(comps(ci).td))
          if (r.bad || s < 0 || s > 11) return false
          val diff = extend(r.bits(s), s)
          pred(ci) += diff
          coefs(ci)(base) = pred(ci) << al
        } else {
          if (r.bit() == 1) coefs(ci)(base) |= (1 << al)
        }
        !r.bad
      }
      if (scomps.length > 1) {
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            var sI = 0
            while (sI < scomps.length) {
              val ci = scomps(sI); val comp = comps(ci)
              var by = 0
              while (by < comp.vs) {
                var bx = 0
                while (bx < comp.hs) {
                  if (!dcUnit(ci,
                    (my * comp.vs + by) * blocksW(ci) + mx * comp.hs + bx))
                    return false
                  bx += 1
                }
                by += 1
              }
              sI += 1
            }
            mx += 1
          }
          my += 1
        }
      } else {
        val ci = scomps(0)
        var by = 0
        while (by < compBH(ci)) {
          var bx = 0
          while (bx < compBW(ci)) {
            if (!dcUnit(ci, by * blocksW(ci) + bx)) return false
            bx += 1
          }
          by += 1
        }
      }
      !r.bad
    } else {
      // AC scan: single component, non-interleaved block raster
      val ci = scomps(0)
      val t = acT(comps(ci).ta)
      val p1 = 1 << al; val m1 = -1 << al
      var eobrun = 0
      var by = 0
      while (by < compBH(ci)) {
        var bx = 0
        while (bx < compBW(ci)) {
          val base = (by * blocksW(ci) + bx) * 64
          if (ah == 0) { // first pass
            if (eobrun > 0) eobrun -= 1
            else {
              var k = ss
              var done = false
              while (k <= se && !done) {
                val rs = decodeHuff(r, t)
                if (r.bad || rs < 0) return false
                val run = rs >> 4; val sMag = rs & 15
                if (sMag == 0) {
                  if (run == 15) k += 16 // ZRL
                  else {
                    eobrun = (1 << run) - 1 +
                      (if (run > 0) r.bits(run) else 0)
                    done = true
                  }
                } else {
                  k += run
                  if (k > se) return false
                  coefs(ci)(base + Zigzag(k)) =
                    extend(r.bits(sMag), sMag) << al
                  k += 1
                }
              }
            }
          } else { // refinement (T.81 G.1.2.3)
            var k = ss
            if (eobrun == 0) {
              var inEob = false
              while (k <= se && !inEob) {
                val rs = decodeHuff(r, t)
                if (r.bad || rs < 0) return false
                var run = rs >> 4
                val sMag = rs & 15
                var newVal = 0
                if (sMag != 0) {
                  if (sMag != 1) return false // refinement sends only ±1
                  newVal = if (r.bit() == 1) p1 else m1
                } else if (run != 15) {
                  eobrun = (1 << run) + (if (run > 0) r.bits(run) else 0)
                  inEob = true
                }
                if (!inEob) {
                  var advanced = false
                  while (k <= se && !advanced) {
                    val idx = base + Zigzag(k)
                    val cur = coefs(ci)(idx)
                    if (cur != 0) {
                      if (r.bit() == 1 && (cur & p1) == 0)
                        coefs(ci)(idx) = cur + (if (cur >= 0) p1 else m1)
                    } else if (run == 0) {
                      if (sMag != 0) coefs(ci)(idx) = newVal
                      advanced = true
                    } else run -= 1
                    k += 1
                  }
                  if (sMag != 0 && !advanced) return false
                }
                if (r.bad) return false
              }
            }
            if (eobrun > 0) {
              while (k <= se) {
                val idx = base + Zigzag(k)
                val cur = coefs(ci)(idx)
                if (cur != 0) {
                  if (r.bit() == 1 && (cur & p1) == 0)
                    coefs(ci)(idx) = cur + (if (cur >= 0) p1 else m1)
                }
                k += 1
              }
              eobrun -= 1
            }
          }
          if (r.bad) return false
          bx += 1
        }
        by += 1
      }
      // a run that claims more blocks than the scan has is corrupt
      eobrun == 0 && !r.bad
    }
  }

  // ---------------------------------------------------------------- encode

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(buf)
          if (buf == 0xff) out.write(0x00) // byte stuffing
          buf = 0; cnt = 0
        }
        i -= 1
      }
    }
    /** byte-align with 1-fill (the spec's pad) */
    def flush(): Unit = if (cnt > 0) { put((1 << (8 - cnt)) - 1, 8 - cnt) }
  }

  private def magnitude(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  private def putCoef(bw: BitWriter, t: HuffTable, v: Int, runSize: Int => Int): Unit = {
    val s = magnitude(v)
    val (code, len) = t.enc(runSize(s))
    bw.put(code, len)
    if (s > 0) bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
  }

  /** Synthesize a baseline JPEG whose DECODE is exact (see object docs):
    * every 8×8 luma block is the constant `yOfBlock(bx, by)` (block
    * coordinates over the padded grid), chroma is the constant
    * `(cb, cr)` per image, quantizers have Q(0,0)=8. `grey` emits one
    * component; otherwise 4:2:0 YCbCr. `restartInterval` > 0 emits DRI +
    * RSTn markers. Values must be 0..255.
    */
  def jpegBytes(w: Int, h: Int, grey: Boolean, yOfBlock: (Int, Int) => Int,
                cb: Int = 128, cr: Int = 128,
                restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0, "empty image")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8) // SOI
    // JFIF APP0
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT: Q(0,0)=8 exact-DC quantizer, 16 elsewhere (AC unused by the
    // fixture but the table must be fully valid)
    val qtBody = Array.tabulate(64)(k => if (k == 0) 8 else 16)
    seg(0xdb, 0 +: qtBody)
    if (!grey) seg(0xdb, 1 +: qtBody)
    // SOF0
    val sof =
      if (grey) Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 1, 0x11, 0)
      else Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 3,
        1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    seg(0xc0, sof)
    // DHT (Annex K typical tables)
    val dcLum = HuffTable(DcLumBits, DcVals)
    val acLum = HuffTable(AcLumBits, AcLumVals)
    val dcChr = HuffTable(DcChrBits, DcVals)
    val acChr = HuffTable(AcChrBits, AcChrVals)
    seg(0xc4, 0x00 +: (DcLumBits ++ DcVals))
    seg(0xc4, 0x10 +: (AcLumBits ++ AcLumVals))
    if (!grey) {
      seg(0xc4, 0x01 +: (DcChrBits ++ DcVals))
      seg(0xc4, 0x11 +: (AcChrBits ++ AcChrVals))
    }
    if (restartInterval > 0)
      seg(0xdd, Array(restartInterval >> 8, restartInterval & 0xff))
    // SOS
    seg(0xda,
      if (grey) Array(1, 1, 0x00, 0, 63, 0)
      else Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    // entropy data
    val bw = new BitWriter(out)
    val mcuPx = if (grey) 8 else 16
    val mcusX = (w + mcuPx - 1) / mcuPx
    val mcusY = (h + mcuPx - 1) / mcuPx
    var predY = 0; var predCb = 0; var predCr = 0
    var mcu = 0; var rstN = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          marker(0xd0 + (rstN % 8))
          rstN += 1
          predY = 0; predCb = 0; predCr = 0
        }
        def yBlock(bx: Int, by: Int): Unit = {
          val v = yOfBlock(bx, by)
          require(v >= 0 && v <= 255, s"luma $v out of range")
          val coded = v - 128 // Q(0,0)=8 makes the coded DC exactly v−128
          putCoef(bw, dcLum, coded - predY, _ & 15)
          predY = coded
          putCoef(bw, acLum, 0, _ => 0x00) // EOB
        }
        if (grey) yBlock(mx, my)
        else {
          yBlock(mx * 2, my * 2); yBlock(mx * 2 + 1, my * 2)
          yBlock(mx * 2, my * 2 + 1); yBlock(mx * 2 + 1, my * 2 + 1)
          putCoef(bw, dcChr, (cb - 128) - predCb, _ & 15); predCb = cb - 128
          putCoef(bw, acChr, 0, _ => 0x00)
          putCoef(bw, dcChr, (cr - 128) - predCr, _ & 15); predCr = cr - 128
          putCoef(bw, acChr, 0, _ => 0x00)
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Synthesize a PROGRESSIVE (SOF2) JPEG of the same DC-exact fixture
    * family as [[jpegBytes]] — same per-block luma / constant chroma /
    * Q(0,0)=8 construction, so the SAME closed-form oracle applies — but
    * laid out as a real progressive scan script that exercises the
    * multi-scan machinery: DC first pass at Al=1, a DC refinement scan
    * (raw bits), then per-component AC first + AC refinement scans whose
    * all-zero spectra are coded as spanning EOBn runs (run > 1 — the
    * branch per-block EOBs never reach) through a custom EOBn huffman
    * table delivered by a BETWEEN-SCANS DHT.
    */
  def jpegProgressiveBytes(w: Int, h: Int, grey: Boolean,
      yOfBlock: (Int, Int) => Int, cb: Int = 128, cr: Int = 128): Array[Byte] = {
    require(w > 0 && h > 0, "empty image")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8)
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    val qtBody = Array.tabulate(64)(k => if (k == 0) 8 else 16)
    seg(0xdb, 0 +: qtBody)
    if (!grey) seg(0xdb, 1 +: qtBody)
    val sof =
      if (grey) Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 1, 0x11, 0)
      else Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 3,
        1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    seg(0xc2, sof)
    val dcLum = HuffTable(DcLumBits, DcVals)
    val dcChr = HuffTable(DcChrBits, DcVals)
    seg(0xc4, 0x00 +: (DcLumBits ++ DcVals))
    if (!grey) seg(0xc4, 0x01 +: (DcChrBits ++ DcVals))
    val mcuPx = if (grey) 8 else 16
    val mcusX = (w + mcuPx - 1) / mcuPx
    val mcusY = (h + mcuPx - 1) / mcuPx
    // ---- scan 1: DC first pass, interleaved, Al = 1 (arithmetic shift)
    seg(0xda,
      if (grey) Array(1, 1, 0x00, 0, 0, 0x01)
      else Array(3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0, 0x01))
    locally {
      val bw = new BitWriter(out)
      var predY = 0; var predCb = 0; var predCr = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          def yBlock(bx: Int, by: Int): Unit = {
            val v = yOfBlock(bx, by)
            require(v >= 0 && v <= 255, s"luma $v out of range")
            val coded = (v - 128) >> 1
            putCoef(bw, dcLum, coded - predY, _ & 15)
            predY = coded
          }
          if (grey) yBlock(mx, my)
          else {
            yBlock(mx * 2, my * 2); yBlock(mx * 2 + 1, my * 2)
            yBlock(mx * 2, my * 2 + 1); yBlock(mx * 2 + 1, my * 2 + 1)
            putCoef(bw, dcChr, ((cb - 128) >> 1) - predCb, _ & 15)
            predCb = (cb - 128) >> 1
            putCoef(bw, dcChr, ((cr - 128) >> 1) - predCr, _ & 15)
            predCr = (cr - 128) >> 1
          }
          mx += 1
        }
        my += 1
      }
      bw.flush()
    }
    // ---- scan 2: DC refinement, interleaved, Ah = 1, Al = 0 (raw bits)
    seg(0xda,
      if (grey) Array(1, 1, 0x00, 0, 0, 0x10)
      else Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x10))
    locally {
      val bw = new BitWriter(out)
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          def yBit(bx: Int, by: Int): Unit =
            bw.put(yOfBlock(bx, by) - 128 & 1, 1)
          if (grey) yBit(mx, my)
          else {
            yBit(mx * 2, my * 2); yBit(mx * 2 + 1, my * 2)
            yBit(mx * 2, my * 2 + 1); yBit(mx * 2 + 1, my * 2 + 1)
            bw.put((cb - 128) & 1, 1)
            bw.put((cr - 128) & 1, 1)
          }
          mx += 1
        }
        my += 1
      }
      bw.flush()
    }
    // ---- EOBn table (between scans): symbols 0x00..0xE0, all length 4
    val eobnBits = Array(0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val eobnVals = (0 to 14).map(_ << 4).toArray
    val eobnT = HuffTable(eobnBits, eobnVals)
    seg(0xc4, 0x10 +: (eobnBits ++ eobnVals))
    // per-component AC scans: first (Al=1) then refinement (Ah=1) — the
    // fixture spectra are all-zero, coded as spanning EOB runs
    def acScan(compId: Int, ahAl: Int, nBlocks: Int): Unit = {
      seg(0xda, Array(1, compId, 0x00, 1, 63, ahAl))
      val bw = new BitWriter(out)
      var n = nBlocks
      while (n > 0) {
        val capped = math.min(n, 32767)
        val rBits = 31 - Integer.numberOfLeadingZeros(capped)
        val chunk = capped // 2^rBits <= capped < 2^(rBits+1)
        val (code, len) = eobnT.enc(rBits << 4)
        bw.put(code, len)
        if (rBits > 0) bw.put(chunk - (1 << rBits), rBits)
        n -= chunk
      }
      bw.flush()
    }
    if (grey) {
      val nB = mcusX * mcusY
      acScan(1, 0x01, nB); acScan(1, 0x10, nB)
    } else {
      val nbY = ((w + 7) / 8) * ((h + 7) / 8)
      val nbC = (((w + 1) / 2 + 7) / 8) * (((h + 1) / 2 + 7) / 8)
      acScan(1, 0x01, nbY); acScan(1, 0x10, nbY)
      acScan(2, 0x01, nbC); acScan(2, 0x10, nbC)
      acScan(3, 0x01, nbC); acScan(3, 0x10, nbC)
    }
    marker(0xd9)
    out.toByteArray
  }

  /** Progressive GRAYSCALE stream from raw per-block coefficient arrays
    * (natural order, identity quantizer) — test scaffolding for the AC
    * refinement paths the all-zero oracle fixtures cannot reach (nonzero
    * history correction bits, newly-significant ±1 insertion, ZRL over
    * mixed history). Script: DC first/refine at Al 1→0, AC first pass at
    * Al=1 (sign-magnitude shift), AC refinement to Al=0 with per-block
    * EOBs (Annex K table). Exactness check: decode equals
    * [[idctReference]] of the same coefficients.
    */
  private[graft] def jpegProgressiveGreyFromCoefs(w: Int, h: Int,
      coefAt: (Int, Int) => Array[Int],
      omitAcRefine: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8)
    seg(0xdb, 0 +: Array.fill(64)(1)) // identity quantizer
    seg(0xc2, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 1, 0x11, 0))
    val dcLum = HuffTable(DcLumBits, DcVals)
    val acLum = HuffTable(AcLumBits, AcLumVals)
    seg(0xc4, 0x00 +: (DcLumBits ++ DcVals))
    seg(0xc4, 0x10 +: (AcLumBits ++ AcLumVals))
    val bW = (w + 7) / 8; val bH = (h + 7) / 8
    def forBlocks(f: Array[Int] => Unit): Unit = {
      var by = 0
      while (by < bH) {
        var bx = 0
        while (bx < bW) { f(coefAt(bx, by)); bx += 1 }
        by += 1
      }
    }
    // DC first (Al=1, arithmetic shift) + DC refine
    seg(0xda, Array(1, 1, 0x00, 0, 0, 0x01))
    locally {
      val bw = new BitWriter(out)
      var pred = 0
      forBlocks { c =>
        val v = c(0) >> 1
        putCoef(bw, dcLum, v - pred, _ & 15)
        pred = v
      }
      bw.flush()
    }
    seg(0xda, Array(1, 1, 0x00, 0, 0, 0x10))
    locally {
      val bw = new BitWriter(out)
      forBlocks { c => bw.put(c(0) & 1, 1) }
      bw.flush()
    }
    // AC first pass at Al=1: sign-magnitude point transform
    def v1(c: Array[Int], k: Int): Int = {
      val full = c(Zigzag(k))
      val mag = math.abs(full) >> 1
      if (full < 0) -mag else mag
    }
    seg(0xda, Array(1, 1, 0x00, 1, 63, 0x01))
    locally {
      val bw = new BitWriter(out)
      forBlocks { c =>
        var run = 0
        var lastNonzero = 0
        var k = 1
        while (k <= 63) { if (v1(c, k) != 0) lastNonzero = k; k += 1 }
        k = 1
        while (k <= lastNonzero) {
          val v = v1(c, k)
          if (v == 0) {
            run += 1
            if (run == 16) { putCoef(bw, acLum, 0, _ => 0xf0); run = 0 }
          } else {
            putCoef(bw, acLum, v, s => (run << 4) | s)
            run = 0
          }
          k += 1
        }
        if (lastNonzero < 63) putCoef(bw, acLum, 0, _ => 0x00) // EOB
      }
      bw.flush()
    }
    // AC refinement to Al=0: corrections + newly-significant ±1.
    // omitAcRefine strands the AC band at Al=1 — the truncated
    // progression the decoder's completeness check must reject.
    if (omitAcRefine) { marker(0xd9); return out.toByteArray }
    seg(0xda, Array(1, 1, 0x00, 1, 63, 0x10))
    locally {
      val bw = new BitWriter(out)
      forBlocks { c =>
        val corr = scala.collection.mutable.ArrayBuffer.empty[Int]
        def flushCorr(): Unit = { corr.foreach(b => bw.put(b, 1)); corr.clear() }
        var run = 0
        var lastNew = 0
        var k = 1
        while (k <= 63) {
          if (v1(c, k) == 0 && c(Zigzag(k)) != 0) lastNew = k
          k += 1
        }
        k = 1
        while (k <= lastNew) {
          val hist = v1(c, k)
          val full = c(Zigzag(k))
          if (hist != 0) corr += (math.abs(full) & 1)
          else if (full != 0) {
            require(math.abs(full) == 1,
              "newly-significant coefficient must be ±1 at this precision")
            val (code, len) = acLum.enc((run << 4) | 1)
            bw.put(code, len)
            bw.put(if (full > 0) 1 else 0, 1)
            flushCorr()
            run = 0
          } else {
            run += 1
            if (run == 16) {
              val (code, len) = acLum.enc(0xf0)
              bw.put(code, len)
              flushCorr()
              run = 0
            }
          }
          k += 1
        }
        // trailing positions: EOB + the pending/remaining correction bits
        var anyTail = run > 0 || corr.nonEmpty
        var k2 = lastNew + 1
        while (k2 <= 63 && !anyTail) {
          if (v1(c, k2) != 0) anyTail = true
          k2 += 1
        }
        if (lastNew < 63 || anyTail) {
          val (code, len) = acLum.enc(0x00)
          bw.put(code, len)
          flushCorr()
          k2 = lastNew + 1
          while (k2 <= 63) {
            if (v1(c, k2) != 0) bw.put(math.abs(c(Zigzag(k2))) & 1, 1)
            k2 += 1
          }
        }
      }
      bw.flush()
    }
    marker(0xd9)
    out.toByteArray
  }

  /** Spec-formula IDCT of one coefficient block (natural order, already
    * dequantized) — exposed for JpegSpec's independent AC-path check. */
  private[graft] def idctReference(coef: Array[Int]): Array[Int] = {
    val outPx = new Array[Int](64)
    var y0 = 0
    while (y0 < 8) {
      var x0 = 0
      while (x0 < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            acc += Cn(u) * Cn(v) * coef(v * 8 + u) * Cos(x0)(u) * Cos(y0)(v)
            v += 1
          }
          u += 1
        }
        val px = math.round(acc / 4 + 128).toInt
        outPx(y0 * 8 + x0) = if (px < 0) 0 else if (px > 255) 255 else px
        x0 += 1
      }
      y0 += 1
    }
    outPx
  }
}
