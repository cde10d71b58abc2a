package graft.ops

import java.io.ByteArrayOutputStream

/** Pure-JVM TIFF decode — the scanned-document codec that pairs with
  * [[PdfText]]: document corpora carry page scans as TIFF (TIFF 6.0,
  * the public Adobe spec), and its lossless compression (LZW, the
  * TIFF variant) makes the exact-oracle discipline apply directly.
  *
  * Strict recognizer per the media-decode discipline: both byte orders
  * (II/MM), first IFD only, baseline 8-bit greyscale (photometric 1) or
  * RGB (photometric 2), chunky planar config, strip-organized,
  * compression 1 (none) or 5 (TIFF-LZW) with optional horizontal
  * predictor (tag 317 = 2); anything else — tiles, palettes, other bit
  * depths, other compressions, planar separation — returns None.
  * Strip byte counts must cover exactly the declared geometry; LZW
  * output is length-checked; a 64 MPx allocation guard bounds hostile
  * headers.
  *
  * TIFF-LZW differs from GIF's ([[GifPixels]]) in exactly three ways,
  * all handled here: codes are MSB-first, the alphabet is fixed at 256
  * (clear=256, EOI=257, first dict entry 258, initial width 9), and the
  * width bumps ONE CODE EARLY (when the next free slot reaches
  * 2^width − 1 — the spec's "early change"). The fixture encoder
  * serializes by replaying this decoder's width state machine, the
  * [[GifPixels.lzwEncode]] technique that makes the off-by-one
  * impossible by construction.
  */
object TiffPixels {

  final case class Stats(width: Int, height: Int, channels: Int, nPx: Long,
                         sumR: Long, sumG: Long, sumB: Long)

  private val MaxPx = 64L * 1024 * 1024

  private final class Reader(p: Array[Byte], le: Boolean) {
    def u8(i: Int): Int = p(i) & 0xff
    def u16(i: Int): Int =
      if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (le) u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      else (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
        (u8(i + 2).toLong << 8) | u8(i + 3).toLong
  }

  /** Decode whole-image exact channel sums, or None out of contract. */
  def decode(bytes: Array[Byte]): Option[Stats] = {
    val p = bytes
    if (p == null || p.length < 8) return None
    val le = p(0) == 'I' && p(1) == 'I'
    val be = p(0) == 'M' && p(1) == 'M'
    if (!le && !be) return None
    val r = new Reader(p, le)
    if (r.u16(2) != 42) return None
    val ifd = r.u32(4)
    if (ifd < 8 || ifd + 2 > p.length) return None
    val n = r.u16(ifd.toInt)
    if (ifd + 2 + n * 12 + 4 > p.length) return None
    // tag -> (type, count, valueOffsetFieldPos)
    var width = -1L; var height = -1L
    var bits = Vector.empty[Long]
    var compression = 1L; var photometric = -1L
    var spp = 1L; var rowsPerStrip = Long.MaxValue
    var predictor = 1L; var planar = 1L
    var stripOffsets = Vector.empty[Long]
    var stripCounts = Vector.empty[Long]
    var i = 0
    while (i < n) {
      val e = ifd.toInt + 2 + i * 12
      val tag = r.u16(e)
      val typ = r.u16(e + 2)
      val count = r.u32(e + 4)
      val elemSize = typ match {
        case 1 | 2 | 6 | 7 => 1L
        case 3 => 2L
        case 4 => 4L
        case _ => -1L
      }
      def values: Option[Vector[Long]] = {
        if (elemSize < 0 || count < 0 || count > (1L << 20)) return None
        val total = elemSize * count
        val base = if (total <= 4) e + 8
        else {
          val off = r.u32(e + 8)
          if (off + total > p.length) return None
          off.toInt
        }
        Some(Vector.tabulate(count.toInt)(k => typ match {
          case 1 | 2 | 6 | 7 => r.u8(base + k).toLong
          case 3 => r.u16(base + 2 * k).toLong
          case _ => r.u32(base + 4 * k)
        }))
      }
      def v1: Option[Long] = values.flatMap(_.headOption)
      tag match {
        case 256 => width = v1.getOrElse(-1L)
        case 257 => height = v1.getOrElse(-1L)
        case 258 => bits = values.getOrElse(return None)
        case 259 => compression = v1.getOrElse(-1L)
        case 262 => photometric = v1.getOrElse(-1L)
        case 273 => stripOffsets = values.getOrElse(return None)
        case 277 => spp = v1.getOrElse(-1L)
        case 278 => rowsPerStrip = v1.getOrElse(-1L)
        case 279 => stripCounts = values.getOrElse(return None)
        case 284 => planar = v1.getOrElse(-1L)
        case 317 => predictor = v1.getOrElse(-1L)
        case _ => // ignored (resolution, software, …)
      }
      i += 1
    }
    if (width < 1 || height < 1 || width * height > MaxPx) return None
    if (photometric != 1 && photometric != 2) return None
    val channels = if (photometric == 2) 3 else 1
    if (spp != channels || planar != 1) return None
    if (bits.isEmpty) bits = Vector.fill(channels)(8L)
    if (bits.size != channels || bits.exists(_ != 8L)) return None
    if (compression != 1 && compression != 5) return None
    if (predictor != 1 && predictor != 2) return None
    if (predictor == 2 && compression == 1) return None // predictor needs LZW
    if (stripOffsets.isEmpty || stripOffsets.size != stripCounts.size) return None
    if (rowsPerStrip < 1) return None
    val rowBytes = width * channels
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var rowsDone = 0L
    var s = 0
    while (s < stripOffsets.size) {
      val off = stripOffsets(s); val cnt = stripCounts(s)
      if (off < 0 || cnt < 0 || off + cnt > p.length) return None
      val rowsHere = math.min(rowsPerStrip, height - rowsDone)
      if (rowsHere <= 0) return None // more strips than geometry needs
      val expect = rowsHere * rowBytes
      if (expect > Int.MaxValue) return None
      val raw =
        if (compression == 1) {
          if (cnt != expect) return None
          java.util.Arrays.copyOfRange(p, off.toInt, (off + cnt).toInt)
        } else {
          val out = lzwDecode(p, off.toInt, cnt.toInt, expect.toInt)
          if (out == null) return None
          out
        }
      // predictor 2: horizontal differencing per row per channel
      if (predictor == 2) {
        var row = 0
        while (row < rowsHere) {
          var x = channels
          val base = row * rowBytes.toInt
          while (x < rowBytes) {
            raw(base + x) = ((raw(base + x) + raw(base + x - channels)) & 0xff).toByte
            x += 1
          }
          row += 1
        }
      }
      var k = 0
      while (k < expect) {
        if (channels == 1) {
          val v = raw(k.toInt) & 0xff
          sumR += v; sumG += v; sumB += v
          k += 1
        } else {
          sumR += raw(k.toInt) & 0xff
          sumG += raw(k.toInt + 1) & 0xff
          sumB += raw(k.toInt + 2) & 0xff
          k += 3
        }
      }
      rowsDone += rowsHere
      s += 1
    }
    if (rowsDone != height) return None
    Some(Stats(width.toInt, height.toInt, channels,
      width * height, sumR, sumG, sumB))
  }

  /** TIFF-variant LZW: MSB-first codes, 256-symbol alphabet, early
    * width change. Returns exactly `nOut` bytes or null.
    */
  private[ops] def lzwDecode(p: Array[Byte], off: Int, len: Int,
      nOut: Int): Array[Byte] = {
    val Clear = 256; val Eoi = 257
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val out = new Array[Byte](nOut)
    var outN = 0
    var width = 9
    var next = 258
    var prev = -1
    var bitPos = 0
    val totalBits = len * 8
    val stack = new Array[Int](4097)
    def firstOf(code: Int): Int = {
      var c = code
      while (c >= 258) c = prefix(c)
      c
    }
    while (true) {
      if (bitPos + width > totalBits) return null
      var code = 0
      var b = 0
      while (b < width) {
        val pos = bitPos + b
        code = (code << 1) |
          ((p(off + (pos >> 3)) >> (7 - (pos & 7))) & 1)
        b += 1
      }
      bitPos += width
      if (code == Clear) {
        width = 9; next = 258; prev = -1
      } else if (code == Eoi) {
        if (outN != nOut) return null
        // trailing padding bits only
        if ((totalBits - bitPos) >= 8) return null
        return out
      } else {
        if (code > next || code == Eoi || (code == next && prev == -1))
          return null
        var sp = 0
        var c = if (code == next) prev else code
        while (c >= 258) {
          if (c >= next) return null
          stack(sp) = suffix(c); sp += 1; c = prefix(c)
        }
        val first = c
        stack(sp) = c; sp += 1
        val extra = if (code == next) 1 else 0
        if (outN + sp + extra > nOut) return null
        while (sp > 0) { sp -= 1; out(outN) = stack(sp).toByte; outN += 1 }
        if (code == next) { out(outN) = first.toByte; outN += 1 }
        if (prev != -1 && next < 4096) {
          prefix(next) = prev; suffix(next) = first
          next += 1
          // the spec's EARLY change: bump when the NEXT free slot is
          // 2^width − 1 (one code before the table actually overflows)
          if (next == (1 << width) - 1 && width < 12) width += 1
        }
        prev = code
      }
    }
    null // unreachable
  }

  // ---- fixture encoder (scaffolding) ----

  /** Greedy LZW code list serialized by replaying the decoder's width
    * machine (MSB-first). A clear is emitted when the table fills.
    */
  private[ops] def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val Clear = 256; val Eoi = 257
    val codes = scala.collection.mutable.ArrayBuffer[Int](Clear)
    if (data.nonEmpty) {
      var dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
      var next = 258
      var cur = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        dict.get((cur, k)) match {
          case Some(c) => cur = c
          case None =>
            if (next < 4096) { dict((cur, k)) = next; next += 1 }
            codes += cur
            if (next == 4096) {
              codes += Clear
              dict = scala.collection.mutable.HashMap.empty
              next = 258
            }
            cur = k
        }
        i += 1
      }
      codes += cur
    }
    codes += Eoi
    val bits = new ByteArrayOutputStream()
    var acc = 0L
    var nAcc = 0
    var width = 9
    var next = 258
    var prevWasData = false
    codes.foreach { c =>
      acc = (acc << width) | c
      nAcc += width
      while (nAcc >= 8) {
        bits.write(((acc >> (nAcc - 8)) & 0xff).toInt); nAcc -= 8
      }
      if (c == Clear) { width = 9; next = 258; prevWasData = false }
      else if (c != Eoi) {
        if (prevWasData && next < 4096) {
          next += 1
          if (next == (1 << width) - 1 && width < 12) width += 1
        }
        prevWasData = true
      }
    }
    if (nAcc > 0) bits.write(((acc << (8 - nAcc)) & 0xff).toInt)
    bits.toByteArray
  }

  /** Serialize a baseline TIFF: 8-bit grey (channels=1) or RGB (3),
    * little-endian, strip-organized with `rowsPerStrip`, compression 1
    * or 5 (+ optional predictor 2 under LZW).
    */
  def tiffBytes(w: Int, h: Int, channels: Int, pix: (Int, Int) => (Int, Int, Int),
      lzw: Boolean, predictor2: Boolean = false,
      rowsPerStrip: Int = Int.MaxValue): Array[Byte] = {
    require(channels == 1 || channels == 3)
    require(!predictor2 || lzw, "predictor 2 rides LZW only")
    val rps = math.min(rowsPerStrip, h)
    val rowBytes = w * channels
    val strips = (0 until h by rps).map { y0 =>
      val rows = math.min(rps, h - y0)
      val raw = new Array[Byte](rows * rowBytes)
      for (dy <- 0 until rows; x <- 0 until w) {
        val (r, g, b) = pix(x, y0 + dy)
        if (channels == 1) raw(dy * rowBytes + x) = r.toByte
        else {
          raw(dy * rowBytes + 3 * x) = r.toByte
          raw(dy * rowBytes + 3 * x + 1) = g.toByte
          raw(dy * rowBytes + 3 * x + 2) = b.toByte
        }
      }
      if (predictor2) {
        for (dy <- 0 until rows) {
          var x = rowBytes - 1
          while (x >= channels) {
            raw(dy * rowBytes + x) =
              ((raw(dy * rowBytes + x) - raw(dy * rowBytes + x - channels)) & 0xff).toByte
            x -= 1
          }
        }
      }
      if (lzw) lzwEncode(raw) else raw
    }
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    out.write('I'); out.write('I'); w16(42)
    val nTags = 9 + (if (predictor2) 1 else 0)
    // layout: header(8) + IFD + [bits array when RGB] + strip data
    val ifdSize = 2 + nTags * 12 + 4
    val bitsOff = 8L + ifdSize
    val bitsSize = if (channels == 3) 6 else 0
    var dataOff = bitsOff + bitsSize
    val stripOffs = strips.map { s => val o = dataOff; dataOff += s.length; o }
    w32(8) // IFD at byte 8
    w16(nTags)
    def tag(t: Int, typ: Int, count: Long, value: Long): Unit = {
      w16(t); w16(typ); w32(count); w32(value)
    }
    def tagShortInline(t: Int, v: Int): Unit = {
      w16(t); w16(3); w32(1)
      w16(v); w16(0)
    }
    // tags must be ascending by id
    tagShortInline(256, w)
    tagShortInline(257, h)
    if (channels == 3) tag(258, 3, 3, bitsOff)
    else tagShortInline(258, 8)
    tagShortInline(259, if (lzw) 5 else 1)
    tagShortInline(262, if (channels == 3) 2 else 1)
    if (strips.size == 1) tag(273, 4, 1, stripOffs.head)
    else { // offset arrays would need a second spill area; single-value
      // strips are enough when rowsPerStrip covers the image — multi-strip
      // fixtures write the arrays inline after the bits area
      tag(273, 4, strips.size.toLong, dataOff)
    }
    tagShortInline(277, channels)
    tagShortInline(278, rps)
    if (strips.size == 1) tag(279, 4, 1, strips.head.length.toLong)
    else tag(279, 4, strips.size.toLong, dataOff + 4L * strips.size)
    if (predictor2) tagShortInline(317, 2)
    w32(0) // next IFD
    if (channels == 3) { w16(8); w16(8); w16(8) }
    strips.foreach(out.write)
    if (strips.size > 1) {
      stripOffs.foreach(w32)
      strips.foreach(s => w32(s.length.toLong))
    }
    out.toByteArray
  }
}
