package graft.ops

/** Pure-JVM FLAC decode (RFC 9639 / the public FLAC format spec) — the
  * compressed-audio twin of [[JpegPixels]], closing the r15 gap that only
  * WAV/PCM decoded. FLAC is LOSSLESS, so it extends the exact-oracle
  * discipline naturally: a closed-form sample formula survives an
  * encode→decode round trip bit-for-bit, and the `mm_decode_flac` gate
  * recomputes every window sum arithmetically (reference behavior:
  * SURVEY §7.1 step 9's multimodal columns).
  *
  * Decoder subset — STRICT recognizer, anything else returns None:
  *   - 16-bit streams, 1-8 channels, fixed block size strategy;
  *   - CONSTANT / VERBATIM / FIXED (orders 0-4) / LPC (orders 1-32)
  *     subframes, wasted bits honored;
  *   - rice residuals (4- and 5-bit parameter methods), any partition
  *     order, escape partitions;
  *   - stereo decorrelation: left/side, right/side, mid/side;
  *   - frame-header CRC-8 and whole-frame CRC-16 VERIFIED; the decoded
  *     sample count must equal STREAMINFO's, and a nonzero STREAMINFO
  *     MD5 is verified against the decoded PCM — integrity is part of
  *     the contract, not best-effort.
  *
  * Allocation guard (the JpegPixels lesson): total samples are bounded
  * before any frame decodes, so a crafted STREAMINFO cannot demand a
  * multi-GB buffer.
  *
  * The ENCODER here is fixture scaffolding (like the staged JPEG/BMP
  * corpora): deterministic, and deliberately cycles subframe types
  * (fixed orders 0-4, verbatim, an LPC frame) and stereo assignments
  * (independent, left/side, right/side, mid/side) per frame so the
  * oracle path exercises every decoder branch.
  */
object FlacPcm {

  final case class FlacAudio(sampleRate: Int, channels: Int, bits: Int,
                             samples: Array[Array[Int]])

  /** Total decoded samples (across channels) above which decode refuses
    * up front — 2^26 ints = 256 MB of sample buffer.
    */
  private val MaxTotalSamples = 1L << 26

  // ----------------------------------------------------------- bit I/O

  private final class BitReader(p: Array[Byte], var pos: Int) {
    var bitPos = 0
    var bad = false
    def byteAligned: Boolean = bitPos == 0
    def bit(): Int = {
      if (pos >= p.length) { bad = true; return 0 }
      val b = (p(pos) >> (7 - bitPos)) & 1
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; pos += 1 }
      b
    }
    /** n ≤ 32 unsigned bits, MSB first. */
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def bitsLong(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** n-bit two's-complement signed. */
    def sbits(n: Int): Int = {
      if (n == 0) return 0
      val v = bits(n)
      if ((v & (1 << (n - 1))) != 0) v - (1 << n) else v
    }
    /** unary: zeros then a 1 → count of zeros. */
    def unary(): Int = {
      var q = 0
      while (!bad && bit() == 0) {
        q += 1
        if (q > (p.length.toLong * 8)) { bad = true; return 0 }
      }
      q
    }
    def alignToByte(): Unit = if (bitPos != 0) { bitPos = 0; pos += 1 }
  }

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nb = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nb += 1
      if (nb == 8) { buf.write(cur); cur = 0; nb = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def unary(q: Int): Unit = { var i = 0; while (i < q) { bit(0); i += 1 }; bit(1) }
    def alignToByte(): Unit = while (nb != 0) bit(0)
    def toBytes: Array[Byte] = { require(nb == 0); buf.toByteArray }
  }

  // ----------------------------------------------------------- CRCs

  private def crc8(p: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= p(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  private def crc16(p: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (p(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // --------------------------------------------------------- decoder

  private val FixedBlockSizes = Array(0, 192, 576, 1152, 2304, 4608, -8, -16,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768)

  def decode(p: Array[Byte]): Option[FlacAudio] = {
    if (p == null || p.length < 42) return None
    if (p(0) != 'f' || p(1) != 'L' || p(2) != 'a' || p(3) != 'C') return None
    var i = 4
    var sampleRate = 0; var channels = 0; var bits = 0
    var totalSamples = 0L
    var md5 = new Array[Byte](16)
    var haveInfo = false
    var last = false
    var first = true
    while (!last) {
      if (i + 4 > p.length) return None
      val hdr = p(i) & 0xff
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7f
      val len = ((p(i + 1) & 0xff) << 16) | ((p(i + 2) & 0xff) << 8) | (p(i + 3) & 0xff)
      i += 4
      if (i + len > p.length) return None
      if (first) {
        // STREAMINFO must be the first metadata block (spec) — strict
        if (btype != 0 || len != 34) return None
        val r = new BitReader(p, i)
        val minB = r.bits(16); val maxB = r.bits(16)
        r.bits(24); r.bits(24) // min/max frame size (informational)
        sampleRate = r.bits(20)
        channels = r.bits(3) + 1
        bits = r.bits(5) + 1
        totalSamples = r.bitsLong(36)
        md5 = java.util.Arrays.copyOfRange(p, i + 18, i + 34)
        if (r.bad || sampleRate == 0 || minB < 16 || maxB < minB) return None
        // strict subset: 16-bit only (the PCM16 contract of the audio ops)
        if (bits != 16) return None
        if (totalSamples <= 0 ||
            totalSamples * channels > MaxTotalSamples) return None
        haveInfo = true
        first = false
      } else if (btype == 0) return None // duplicate STREAMINFO
      i += len
    }
    if (!haveInfo) return None
    val out = Array.fill(channels)(new Array[Int](totalSamples.toInt))
    var got = 0L
    var frameIdx = 0L
    while (got < totalSamples) {
      val frameStart = i
      val r = new BitReader(p, i)
      if (r.bits(14) != 0x3ffe) return None // sync
      if (r.bit() != 0) return None         // reserved
      val variableBlocking = r.bit() == 1
      val bsCode = r.bits(4)
      val srCode = r.bits(4)
      val chCode = r.bits(4)
      val ssCode = r.bits(3)
      if (r.bit() != 0) return None         // reserved
      if (bsCode == 0 || srCode == 15) return None
      // coded number (UTF-8 style): frame number for fixed blocking
      val first8 = r.bits(8)
      var codedLen = 0
      var codedVal = 0L
      if ((first8 & 0x80) == 0) { codedVal = first8 }
      else {
        var mask = 0x40
        while ((first8 & mask) != 0) { codedLen += 1; mask >>= 1 }
        if (codedLen < 1 || codedLen > 6) return None
        codedVal = (first8 & (mask - 1)).toLong
        var j = 0
        while (j < codedLen) {
          val c = r.bits(8)
          if ((c & 0xc0) != 0x80) return None
          codedVal = (codedVal << 6) | (c & 0x3f)
          j += 1
        }
      }
      if (!variableBlocking && codedVal != frameIdx) return None
      val blockSize = bsCode match {
        case 6 => r.bits(8) + 1
        case 7 => r.bits(16) + 1
        case c => FixedBlockSizes(c)
      }
      srCode match { // explicit rates: consume, require STREAMINFO match
        case 12 => if (r.bits(8) * 1000 != sampleRate) return None
        case 13 => if (r.bits(16) != sampleRate) return None
        case 14 => if (r.bits(16) * 10 != sampleRate) return None
        case _ => ()
      }
      val frameBits = ssCode match {
        case 0 => bits
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => return None
      }
      if (frameBits != bits) return None
      val (nCh, assign) =
        if (chCode <= 7) (chCode + 1, -1)
        else if (chCode <= 10) (2, chCode - 8) // 0=L/S, 1=R/S, 2=M/S
        else return None
      if (nCh != channels) return None
      if (blockSize <= 0 || got + blockSize > totalSamples) return None
      // CRC-8 covers the header bytes up to (not incl.) the CRC byte
      if (!r.byteAligned) return None
      val hdrCrc = crc8(p, frameStart, r.pos)
      if (r.bits(8) != hdrCrc) return None
      // subframes
      val chans = new Array[Array[Int]](channels)
      var c = 0
      while (c < channels) {
        val sideBit = assign match {
          case 0 => if (c == 1) 1 else 0 // left/side
          case 1 => if (c == 0) 1 else 0 // right/side
          case 2 => if (c == 1) 1 else 0 // mid/side
          case _ => 0
        }
        decodeSubframe(r, blockSize, frameBits + sideBit) match {
          case Some(s) => chans(c) = s
          case None => return None
        }
        c += 1
      }
      r.alignToByte()
      if (r.pos + 2 > p.length) return None
      val fCrc = crc16(p, frameStart, r.pos)
      if (r.bits(16) != fCrc || r.bad) return None
      // stereo un-decorrelation
      assign match {
        case 0 => // left/side: r = l - s
          var j = 0
          while (j < blockSize) { chans(1)(j) = chans(0)(j) - chans(1)(j); j += 1 }
        case 1 => // right/side: l = r + s
          var j = 0
          while (j < blockSize) {
            val rgt = chans(1)(j); val s = chans(0)(j)
            chans(0)(j) = rgt + s; chans(1)(j) = rgt
            j += 1
          }
        case 2 => // mid/side
          var j = 0
          while (j < blockSize) {
            val mid = chans(0)(j); val s = chans(1)(j)
            val t = (mid << 1) | (s & 1)
            chans(0)(j) = (t + s) >> 1
            chans(1)(j) = (t - s) >> 1
            j += 1
          }
        case _ => ()
      }
      c = 0
      while (c < channels) {
        System.arraycopy(chans(c), 0, out(c), got.toInt, blockSize)
        c += 1
      }
      got += blockSize
      frameIdx += 1
      i = r.pos
    }
    // nonzero STREAMINFO MD5: verify against interleaved LE PCM
    if (md5.exists(_ != 0)) {
      if (!java.util.Arrays.equals(md5, pcmMd5(out, totalSamples.toInt)))
        return None
    }
    Some(FlacAudio(sampleRate, channels, bits, out))
  }

  private def decodeSubframe(r: BitReader, n: Int, bps: Int): Option[Array[Int]] = {
    if (r.bit() != 0) return None // padding
    val stype = r.bits(6)
    var wasted = 0
    if (r.bit() == 1) { wasted = r.unary() + 1; if (r.bad) return None }
    val eb = bps - wasted
    if (eb <= 0 || eb > 31) return None
    val out: Array[Int] =
      if (stype == 0) { // CONSTANT
        val v = r.sbits(eb)
        Array.fill(n)(v)
      } else if (stype == 1) { // VERBATIM
        Array.fill(n)(r.sbits(eb))
      } else if ((stype & 0x38) == 0x08 && (stype & 0x07) <= 4) { // FIXED
        val order = stype & 0x07
        if (order > n) return None
        val s = new Array[Int](n)
        var j = 0
        while (j < order) { s(j) = r.sbits(eb); j += 1 }
        val res = decodeResidual(r, n, order).getOrElse(return None)
        j = order
        while (j < n) {
          val pred: Long = order match {
            case 0 => 0L
            case 1 => s(j - 1).toLong
            case 2 => 2L * s(j - 1) - s(j - 2)
            case 3 => 3L * s(j - 1) - 3L * s(j - 2) + s(j - 3)
            case 4 => 4L * s(j - 1) - 6L * s(j - 2) + 4L * s(j - 3) - s(j - 4)
          }
          s(j) = (pred + res(j - order)).toInt
          j += 1
        }
        s
      } else if ((stype & 0x20) != 0) { // LPC, order = low5 + 1
        val order = (stype & 0x1f) + 1
        if (order > n) return None
        val s = new Array[Int](n)
        var j = 0
        while (j < order) { s(j) = r.sbits(eb); j += 1 }
        val precM1 = r.bits(4)
        if (precM1 == 15) return None
        val prec = precM1 + 1
        val shift = r.sbits(5)
        if (shift < 0) return None // spec: negative shift reserved
        val coefs = new Array[Int](order)
        j = 0
        while (j < order) { coefs(j) = r.sbits(prec); j += 1 }
        val res = decodeResidual(r, n, order).getOrElse(return None)
        j = order
        while (j < n) {
          var acc = 0L
          var t = 0
          while (t < order) { acc += coefs(t).toLong * s(j - 1 - t); t += 1 }
          s(j) = ((acc >> shift) + res(j - order)).toInt
          j += 1
        }
        s
      } else return None // reserved subframe types
    if (r.bad) return None
    if (wasted > 0) {
      var j = 0
      while (j < n) { out(j) = out(j) << wasted; j += 1 }
    }
    Some(out)
  }

  /** Rice-coded residual: n - order values. */
  private def decodeResidual(r: BitReader, n: Int, order: Int): Option[Array[Int]] = {
    val method = r.bits(2)
    if (method > 1) return None
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 15 else 31
    val partOrder = r.bits(4)
    val parts = 1 << partOrder
    if (n % parts != 0) return None
    val perPart = n / parts
    if (perPart < order) return None
    val res = new Array[Int](n - order)
    var idx = 0
    var pI = 0
    while (pI < parts) {
      val cnt = if (pI == 0) perPart - order else perPart
      val param = r.bits(pBits)
      if (param == escape) {
        val raw = r.bits(5)
        var j = 0
        while (j < cnt) { res(idx) = if (raw == 0) 0 else r.sbits(raw); idx += 1; j += 1 }
      } else {
        var j = 0
        while (j < cnt) {
          val q = r.unary()
          if (r.bad) return None
          val v = (q.toLong << param) | r.bits(param).toLong
          res(idx) = ((v >> 1) ^ -(v & 1L)).toInt
          idx += 1; j += 1
        }
      }
      pI += 1
    }
    if (r.bad) None else Some(res)
  }

  private def pcmMd5(ch: Array[Array[Int]], n: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val row = new Array[Byte](2 * ch.length)
    var j = 0
    while (j < n) {
      var c = 0
      while (c < ch.length) {
        val v = ch(c)(j)
        row(2 * c) = (v & 0xff).toByte
        row(2 * c + 1) = ((v >> 8) & 0xff).toByte
        c += 1
      }
      md.update(row)
      j += 1
    }
    md.digest()
  }

  // --------------------------------------------------------- encoder

  /** Deterministic 16-bit FLAC encoder — FIXTURE SCAFFOLDING. Frame f
    * cycles the subframe strategy (f%7: fixed orders 0,1,2 / verbatim /
    * fixed 3,4 / an order-2 LPC with coefs {2,-1} — numerically the
    * fixed-2 predictor, exercising the LPC read path) and, for stereo,
    * the channel assignment (f%4: independent, left/side, right/side,
    * mid/side). Rice parameter per partition is chosen by exact cost
    * minimization, with the escape branch taken when raw coding wins.
    * STREAMINFO carries the real PCM MD5, so decode verifies integrity
    * end to end.
    */
  def flacEncode16(sampleRate: Int, chIn: Array[Array[Int]],
                   blockSize: Int = 64): Array[Byte] = {
    val channels = chIn.length
    require(channels >= 1 && channels <= 8)
    val n = chIn(0).length
    require(chIn.forall(_.length == n) && n > 0)
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (last metadata block)
    val si = new BitWriter
    si.bits(blockSize.toLong, 16); si.bits(blockSize.toLong, 16)
    si.bits(0L, 24); si.bits(0L, 24)
    si.bits(sampleRate.toLong, 20)
    si.bits((channels - 1).toLong, 3)
    si.bits(15L, 5) // bits-1 = 15
    si.bits(n.toLong, 36)
    si.alignToByte()
    val md5 = pcmMd5(chIn, n)
    val siBytes = si.toBytes ++ md5
    out.write(0x80) // last-block flag | type 0
    out.write(0); out.write(siBytes.length >> 8); out.write(siBytes.length & 0xff)
    out.write(siBytes, 0, siBytes.length)
    var off = 0
    var f = 0L
    while (off < n) {
      val bs = math.min(blockSize, n - off)
      // stereo cycles left/side, right/side, mid/side, independent
      val assign = if (channels == 2 && (f % 4) != 3) (f % 4).toInt else -1
      val w = new BitWriter
      w.bits(0x3ffeL, 14); w.bit(0); w.bit(0) // sync, reserved, fixed blocking
      w.bits(6L, 4)                            // 8-bit explicit block size
      w.bits(0L, 4)                            // sample rate from STREAMINFO
      val chCode = assign match {
        case -1 => channels - 1
        case a => 8 + a
      }
      w.bits(chCode.toLong, 4)
      w.bits(4L, 3) // 16-bit
      w.bit(0)
      // coded frame number (UTF-8 style)
      if (f < 0x80) w.bits(f, 8)
      else if (f < 0x800) { w.bits(0xc0L | (f >> 6), 8); w.bits(0x80L | (f & 0x3f), 8) }
      else { w.bits(0xe0L | (f >> 12), 8); w.bits(0x80L | ((f >> 6) & 0x3f), 8)
             w.bits(0x80L | (f & 0x3f), 8) }
      w.bits((bs - 1).toLong, 8)
      val hdrBytes = { w.alignToByte(); w.toBytes } // header is byte-aligned here
      val body = new BitWriter
      // subframe channel data under the chosen assignment
      val block: Array[Array[Int]] = {
        val raw = Array.tabulate(channels)(c =>
          java.util.Arrays.copyOfRange(chIn(c), off, off + bs))
        assign match {
          case 0 => Array(raw(0), Array.tabulate(bs)(j => raw(0)(j) - raw(1)(j)))
          case 1 => Array(Array.tabulate(bs)(j => raw(0)(j) - raw(1)(j)), raw(1))
          case 2 => Array(Array.tabulate(bs)(j => (raw(0)(j) + raw(1)(j)) >> 1),
                          Array.tabulate(bs)(j => raw(0)(j) - raw(1)(j)))
          case _ => raw
        }
      }
      var c = 0
      while (c < channels) {
        val sideBit = assign match {
          case 0 => if (c == 1) 1 else 0
          case 1 => if (c == 0) 1 else 0
          case 2 => if (c == 1) 1 else 0
          case _ => 0
        }
        encodeSubframe(body, block(c), 16 + sideBit, (f % 7).toInt, bs)
        c += 1
      }
      body.alignToByte()
      val frameNoCrc = hdrBytes ++ Array[Byte]() // header, then crc8, then body
      val crc8v = crc8(frameNoCrc, 0, frameNoCrc.length)
      val frameBytes = frameNoCrc ++ Array(crc8v.toByte) ++ body.toBytes
      val crc16v = crc16(frameBytes, 0, frameBytes.length)
      out.write(frameBytes, 0, frameBytes.length)
      out.write((crc16v >> 8) & 0xff); out.write(crc16v & 0xff)
      off += bs
      f += 1
    }
    out.toByteArray
  }

  private def encodeSubframe(w: BitWriter, s: Array[Int], bps: Int,
                             mode: Int, n: Int): Unit = {
    if (s.forall(_ == s(0))) { // CONSTANT
      w.bit(0); w.bits(0L, 6); w.bit(0)
      w.bits((s(0).toLong) & ((1L << bps) - 1), bps)
      return
    }
    val order = mode match {
      case 0 => 0
      case 1 => 1
      case 2 => 2
      case 3 => -1 // verbatim
      case 4 => 3
      case 5 => 4
      case 6 => -2 // LPC(2)
      case _ => 0
    }
    if (order == -1 || n <= 4) { // VERBATIM (also tiny blocks: keep it simple)
      w.bit(0); w.bits(1L, 6); w.bit(0)
      var j = 0
      while (j < n) { w.bits(s(j).toLong & ((1L << bps) - 1), bps); j += 1 }
      return
    }
    val effOrder = if (order == -2) 2 else order
    // residuals of the fixed predictor (LPC {2,-1} shift 0 == fixed-2)
    val res = new Array[Long](n - effOrder)
    var j = effOrder
    while (j < n) {
      val pred: Long = effOrder match {
        case 0 => 0L
        case 1 => s(j - 1).toLong
        case 2 => 2L * s(j - 1) - s(j - 2)
        case 3 => 3L * s(j - 1) - 3L * s(j - 2) + s(j - 3)
        case 4 => 4L * s(j - 1) - 6L * s(j - 2) + 4L * s(j - 3) - s(j - 4)
      }
      res(j - effOrder) = s(j) - pred
      j += 1
    }
    w.bit(0)
    if (order == -2) w.bits((0x20 | (2 - 1)).toLong, 6)
    else w.bits((0x08 | effOrder).toLong, 6)
    w.bit(0) // no wasted bits
    j = 0
    while (j < effOrder) { w.bits(s(j).toLong & ((1L << bps) - 1), bps); j += 1 }
    if (order == -2) { // LPC header: precision 3 (write 2), shift 0, coefs 2,-1
      w.bits(2L, 4); w.bits(0L, 5)
      w.bits(2L & 0x7, 3); w.bits((-1L) & 0x7, 3)
    }
    // residual: method 0 (4-bit rice), partition order 1 when it divides
    val partOrder = if (n % 2 == 0 && n / 2 > effOrder) 1 else 0
    w.bits(0L, 2); w.bits(partOrder.toLong, 4)
    val parts = 1 << partOrder
    val perPart = n / parts
    var pI = 0
    var idx = 0
    while (pI < parts) {
      val cnt = if (pI == 0) perPart - effOrder else perPart
      val zig = new Array[Long](cnt)
      var mx = 0L
      var k2 = 0
      while (k2 < cnt) {
        val v = res(idx + k2)
        val z = (v << 1) ^ (v >> 63)
        zig(k2) = z; if (z > mx) mx = z
        k2 += 1
      }
      // exact cost minimization over rice params 0..14 vs raw escape
      var bestK = 0; var bestCost = Long.MaxValue
      var k = 0
      while (k <= 14) {
        var cost = 0L
        var t = 0
        while (t < cnt) { cost += (zig(t) >>> k) + 1 + k; t += 1 }
        if (cost < bestCost) { bestCost = cost; bestK = k }
        k += 1
      }
      val rawBits = if (mx == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(mx).toInt
      val rawLen = math.min(rawBits + 1, 31) // signed needs one more bit
      if (5L + rawLen.toLong * cnt < bestCost) { // escape wins
        w.bits(15L, 4); w.bits(rawLen.toLong, 5)
        var t = 0
        while (t < cnt) {
          w.bits(res(idx + t) & ((1L << rawLen) - 1), rawLen)
          t += 1
        }
      } else {
        w.bits(bestK.toLong, 4)
        var t = 0
        while (t < cnt) {
          val z = zig(t)
          val q = (z >>> bestK).toInt
          w.unary(q)
          w.bits(z & ((1L << bestK) - 1), bestK)
          t += 1
        }
      }
      idx += cnt
      pI += 1
    }
  }
}
