package graft.ops

import java.io.ByteArrayOutputStream

/** Pure-JVM GIF decode — the third REAL compressed-image codec next to
  * [[PngPixels]] (DEFLATE) and [[JpegPixels]] (DCT), and the one that
  * buys the pipeline a FRAME-SAMPLE path: GIF is the only animated
  * format whose codec (LZW, GIF89a §22 / the public spec) is fully
  * implementable and LOSSLESS in plain JVM code, so multi-frame
  * sampling — the video-corpus operation — gets a bit-exact oracle here
  * while H.264 stays documented-out ([[Mp4Headers]] scaladoc).
  *
  * Strict recognizer per the media-decode discipline: signature, exact
  * logical-screen / image-descriptor bounds, palette-range-checked LZW
  * output with the exact pixel count followed by EOI, validated
  * extension framing, disposal 0/1/2 only (3 = restore-previous needs a
  * canvas snapshot history; rejected, not guessed), and a 4 MPx canvas
  * + 256-frame allocation guard (the JpegPixels plane-cap lesson).
  * Anything out of contract returns None and falls to the caller's
  * fallback path.
  *
  * Compositing contract (what [[decode]]'s per-frame stats mean): the
  * canvas starts as the background colour (global palette at the
  * logical-screen background index); each frame draws its rect (skipping
  * transparent pixels when its GCE flags one); stats are taken AFTER the
  * draw; then disposal runs (2 = restore the frame's rect to the
  * background colour) before the next frame.
  */
object GifPixels {

  /** Whole-canvas exact channel sums after compositing frame `idx`. */
  final case class FrameStats(idx: Int, left: Int, top: Int, w: Int, h: Int,
      delayCs: Int, interlaced: Boolean, sumR: Long, sumG: Long, sumB: Long)

  final case class Gif(width: Int, height: Int, frames: Vector[FrameStats])

  private val MaxCanvasPx = 4L * 1024 * 1024
  private val MaxFrames = 256

  private def u8(p: Array[Byte], i: Int): Int = p(i) & 0xff
  private def le16(p: Array[Byte], i: Int): Int = u8(p, i) | (u8(p, i + 1) << 8)

  /** Decode a GIF87a/89a stream into per-frame composited canvas stats. */
  def decode(bytes: Array[Byte]): Option[Gif] = {
    val p = bytes
    if (p == null || p.length < 13) return None
    val sig = new String(p, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = le16(p, 6); val h = le16(p, 8)
    val packed = u8(p, 10)
    val bgIndex = u8(p, 11)
    if (w < 1 || h < 1 || w.toLong * h > MaxCanvasPx) return None
    var i = 13
    var gct: Array[Int] = null // packed 0xRRGGBB
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (i + 3 * n > p.length) return None
      gct = Array.tabulate(n)(k =>
        (u8(p, i + 3 * k) << 16) | (u8(p, i + 3 * k + 1) << 8) | u8(p, i + 3 * k + 2))
      i += 3 * n
    }
    // canvas: per-pixel packed RGB; background = GCT[bgIndex] (or black
    // when no GCT — then every frame needs a local table)
    val bg = if (gct != null && bgIndex < gct.length) gct(bgIndex) else 0
    val canvas = Array.fill(w * h)(bg)
    var frames = Vector.empty[FrameStats]
    // pending GCE state (applies to the next image descriptor only)
    var disposal = 0
    var transparent = -1
    var delayCs = 0
    var sawTrailer = false
    while (!sawTrailer) {
      if (i >= p.length) return None
      u8(p, i) match {
        case 0x3b => // trailer — must be the final byte (strict)
          if (i != p.length - 1) return None
          sawTrailer = true
        case 0x21 => // extension
          if (i + 1 >= p.length) return None
          val label = u8(p, i + 1)
          i += 2
          if (label == 0xf9) { // graphic control
            if (i + 6 > p.length || u8(p, i) != 4 || u8(p, i + 5) != 0) return None
            val gp = u8(p, i + 1)
            disposal = (gp >> 2) & 7
            if (disposal > 2) return None
            delayCs = le16(p, i + 2)
            transparent = if ((gp & 1) != 0) u8(p, i + 4) else -1
            i += 6
          } else { // comment/app/plain-text: validated sub-block skip
            var done = false
            while (!done) {
              if (i >= p.length) return None
              val n = u8(p, i)
              if (i + 1 + n > p.length) return None
              i += 1 + n
              if (n == 0) done = true
            }
          }
        case 0x2c => // image descriptor
          if (frames.size >= MaxFrames) return None
          if (i + 10 > p.length) return None
          val left = le16(p, i + 1); val top = le16(p, i + 3)
          val fw = le16(p, i + 5); val fh = le16(p, i + 7)
          val fp = u8(p, i + 9)
          i += 10
          if (fw < 1 || fh < 1 || left + fw > w || top + fh > h) return None
          val interlaced = (fp & 0x40) != 0
          var table = gct
          if ((fp & 0x80) != 0) {
            val n = 2 << (fp & 7)
            if (i + 3 * n > p.length) return None
            table = Array.tabulate(n)(k =>
              (u8(p, i + 3 * k) << 16) | (u8(p, i + 3 * k + 1) << 8) |
                u8(p, i + 3 * k + 2))
            i += 3 * n
          }
          if (table == null) return None
          // LZW data: min code size + sub-blocks
          if (i >= p.length) return None
          val minCode = u8(p, i)
          i += 1
          if (minCode < 2 || minCode > 8) return None
          val data = new ByteArrayOutputStream()
          var done = false
          while (!done) {
            if (i >= p.length) return None
            val n = u8(p, i)
            if (i + 1 + n > p.length) return None
            data.write(p, i + 1, n)
            i += 1 + n
            if (n == 0) done = true
          }
          val idx = lzwDecode(data.toByteArray, minCode, fw * fh, table.length)
          if (idx == null) return None
          // draw (interlace-reordered), then stats, then disposal
          val rowMap = rowOrder(fh, interlaced)
          var sy = 0
          while (sy < fh) {
            val y = top + rowMap(sy)
            var x = 0
            while (x < fw) {
              val v = idx(sy * fw + x)
              if (v != transparent) canvas((y * w) + left + x) = table(v)
              x += 1
            }
            sy += 1
          }
          var sumR = 0L; var sumG = 0L; var sumB = 0L
          var k = 0
          while (k < canvas.length) {
            val c = canvas(k)
            sumR += (c >> 16) & 0xff; sumG += (c >> 8) & 0xff; sumB += c & 0xff
            k += 1
          }
          frames = frames :+ FrameStats(frames.size, left, top, fw, fh,
            delayCs, interlaced, sumR, sumG, sumB)
          if (disposal == 2) {
            var y = top
            while (y < top + fh) {
              var x = left
              while (x < left + fw) { canvas(y * w + x) = bg; x += 1 }
              y += 1
            }
          }
          disposal = 0; transparent = -1; delayCs = 0
        case _ => return None
      }
    }
    if (frames.isEmpty) return None
    Some(Gif(w, h, frames))
  }

  /** Pass row order: source stream row j lands on canvas row
    * rowOrder(j) — identity when not interlaced, the 8/8/4/2 pass
    * schedule otherwise.
    */
  private[ops] def rowOrder(fh: Int, interlaced: Boolean): Array[Int] =
    if (!interlaced) Array.tabulate(fh)(identity)
    else (Seq.range(0, fh, 8) ++ Seq.range(4, fh, 8) ++
      Seq.range(2, fh, 4) ++ Seq.range(1, fh, 2)).toArray

  /** GIF-variant LZW decode: exactly `nPixels` palette-checked indices
    * then EOI, variable 3–12-bit codes LSB-first, clear resets, the
    * KwKwK case, deferred-clear tolerance at a full table. Returns null
    * on any contract violation (code past table, wrong pixel count,
    * bits exhausted before EOI).
    */
  private[ops] def lzwDecode(data: Array[Byte], minCode: Int, nPixels: Int,
      paletteSize: Int): Array[Int] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val out = new Array[Int](nPixels)
    var outN = 0
    var codeSize = minCode + 1
    var maxCode = 1 << codeSize
    var next = eoi + 1
    var prev = -1
    var bitPos = 0
    val totalBits = data.length * 8
    val stack = new Array[Int](4097)
    def firstOf(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }
    var finished = false
    while (!finished) {
      if (bitPos + codeSize > totalBits) return null
      var code = 0
      var b = 0
      while (b < codeSize) {
        val pos = bitPos + b
        if ((data(pos >> 3) & (1 << (pos & 7))) != 0) code |= 1 << b
        b += 1
      }
      bitPos += codeSize
      if (code == clear) {
        codeSize = minCode + 1; maxCode = 1 << codeSize
        next = eoi + 1; prev = -1
      } else if (code == eoi) {
        if (outN != nPixels) return null
        finished = true
      } else {
        if (code > next || (code == next && prev == -1)) return null
        if (code < clear && code >= paletteSize) return null
        // expand to stack (root-checked against the palette)
        var sp = 0
        var c = if (code == next) prev else code
        while (c >= clear) {
          if (c >= next) return null
          stack(sp) = suffix(c); sp += 1; c = prefix(c)
        }
        if (c >= paletteSize) return null
        val first = c
        stack(sp) = c; sp += 1
        val extra = if (code == next) 1 else 0
        if (outN + sp + extra > nPixels) return null
        while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
        if (code == next) { out(outN) = first; outN += 1 }
        if (prev != -1 && next < 4096) {
          prefix(next) = prev; suffix(next) = first
          next += 1
          if (next == maxCode && codeSize < 12) { codeSize += 1; maxCode <<= 1 }
        }
        prev = code
      }
    }
    // trailing padding bits in the final byte are legal; trailing whole
    // data after EOI means a corrupt encoder — reject
    if ((totalBits - bitPos) >= 8) return null
    out
  }

  // ---- fixture encoder (scaffolding — specs + the staged mm_decode_gif
  // corpus; a real crawl supplies the bytes) ----

  /** One frame to encode: `pix` maps GLOBAL canvas coordinates inside
    * the frame rect to a palette index (or `transparentIndex` to leave
    * the canvas pixel untouched when ≥ 0).
    */
  final case class FrameSpec(left: Int, top: Int, fw: Int, fh: Int,
      pix: (Int, Int) => Int, delayCs: Int = 0, disposal: Int = 1,
      interlace: Boolean = false, transparentIndex: Int = -1)

  /** Serialize a GIF89a stream: global palette (size must be a power of
    * two in 4..256), background index, frames each with its own GCE.
    * `clearEvery` > 0 inserts an LZW clear every N emitted codes
    * (exercising decoder resets); 0 = single table with deferred clear.
    */
  def gifBytes(w: Int, h: Int, palette: IndexedSeq[(Int, Int, Int)],
      bgIndex: Int, frames: Seq[FrameSpec],
      clearEvery: Int = 0): Array[Byte] = {
    require(Integer.bitCount(palette.size) == 1 && palette.size >= 4 &&
      palette.size <= 256, s"palette size ${palette.size} not a power of two in 4..256")
    val bits = 31 - Integer.numberOfLeadingZeros(palette.size)
    val out = new ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(w); w16(h)
    w8(0x80 | ((bits - 1) << 4) | (bits - 1)) // GCT present, size 2^bits
    w8(bgIndex); w8(0)
    palette.foreach { case (r, g, b) => w8(r); w8(g); w8(b) }
    frames.foreach { f =>
      require(f.left + f.fw <= w && f.top + f.fh <= h, "frame rect outside canvas")
      // GCE
      w8(0x21); w8(0xf9); w8(4)
      w8((f.disposal << 2) | (if (f.transparentIndex >= 0) 1 else 0))
      w16(f.delayCs)
      w8(math.max(0, f.transparentIndex)); w8(0)
      // image descriptor (global table)
      w8(0x2c); w16(f.left); w16(f.top); w16(f.fw); w16(f.fh)
      w8(if (f.interlace) 0x40 else 0)
      val order = rowOrder(f.fh, f.interlace)
      val pixels = new Array[Int](f.fw * f.fh)
      var j = 0
      while (j < f.fh) {
        val y = f.top + order(j)
        var x = 0
        while (x < f.fw) {
          pixels(j * f.fw + x) = f.pix(f.left + x, y)
          x += 1
        }
        j += 1
      }
      val minCode = math.max(2, bits)
      w8(minCode)
      val lzw = lzwEncode(pixels, minCode, clearEvery)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        w8(n); out.write(lzw, off, n)
        off += n
      }
      w8(0)
    }
    w8(0x3b)
    out.toByteArray
  }

  /** LZW encode: greedy matching producing the code list, then a
    * serialization pass that replays the DECODER's width state machine —
    * the two phases make the early-change off-by-one impossible by
    * construction.
    */
  private[ops] def lzwEncode(pixels: Array[Int], minCode: Int,
      clearEvery: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    // phase 1: code list
    val codes = scala.collection.mutable.ArrayBuffer[Int](clear)
    if (pixels.nonEmpty) {
      var dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
      var next = eoi + 1
      var sinceClear = 0
      var cur = pixels(0)
      var i = 1
      def emit(c: Int): Unit = {
        codes += c
        sinceClear += 1
        if ((clearEvery > 0 && sinceClear >= clearEvery) || next == 4096) {
          codes += clear
          dict = scala.collection.mutable.HashMap.empty
          next = eoi + 1
          sinceClear = 0
        }
      }
      while (i < pixels.length) {
        val k = pixels(i)
        dict.get((cur, k)) match {
          case Some(c) => cur = c
          case None =>
            val addable = next < 4096
            if (addable) { dict((cur, k)) = next; next += 1 }
            emit(cur)
            cur = k
        }
        i += 1
      }
      codes += cur
    }
    codes += eoi
    // phase 2: serialize with the decoder's width schedule
    val bits = new ByteArrayOutputStream()
    var acc = 0L
    var nAcc = 0
    var codeSize = minCode + 1
    var maxCode = 1 << codeSize
    var next = eoi + 1
    var prevWasData = false
    codes.foreach { c =>
      acc |= c.toLong << nAcc
      nAcc += codeSize
      while (nAcc >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nAcc -= 8 }
      if (c == clear) {
        codeSize = minCode + 1; maxCode = 1 << codeSize
        next = eoi + 1; prevWasData = false
      } else if (c != eoi) {
        // the decoder adds one table entry per data code after the first
        if (prevWasData && next < 4096) {
          next += 1
          if (next == maxCode && codeSize < 12) { codeSize += 1; maxCode <<= 1 }
        }
        prevWasData = true
      }
    }
    if (nAcc > 0) bits.write((acc & 0xff).toInt)
    bits.toByteArray
  }
}
