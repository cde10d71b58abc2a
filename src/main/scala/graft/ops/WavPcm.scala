package graft.ops

/** Pure-JVM WAV PCM *sample* decode — the audio twin of [[BmpPixels]]:
  * 16-bit little-endian PCM needs no codec library, so the multimodal
  * path can exercise a REAL end-to-end sample walk (not just the
  * [[WavHeaders]] header parse) in this environment. Strict recognizer:
  * only mono 16-bit PCM (format tag 1) decodes; anything else returns
  * None and falls to the caller's fallback path.
  *
  * Statistics are exact integers (sample sums and sums of squares per
  * fixed-size window), so windowed energy/silence decisions reproduce
  * bit-for-bit in an arithmetic oracle — the `mm_audio_energy` gate
  * recomputes every window from the generator formula.
  */
object WavPcm {

  private def u8(b: Byte): Int = b & 0xff
  private def le16(p: Array[Byte], i: Int): Int = u8(p(i)) | (u8(p(i + 1)) << 8)
  private def le32(p: Array[Byte], i: Int): Long =
    u8(p(i)).toLong | (u8(p(i + 1)).toLong << 8) |
      (u8(p(i + 2)).toLong << 16) | (u8(p(i + 3)).toLong << 24)
  private def tag(p: Array[Byte], i: Int, s: String): Boolean =
    p.length >= i + 4 && (0 until 4).forall(j => p(i + j) == s.charAt(j).toByte)

  /** One window's exact integer statistics. */
  final case class WindowStats(windowId: Int, nSamples: Long,
                               sumS: Long, sumSq: Long)

  /** Locate fmt + data: (channels, rate, bits, dataOff, dataLen), None
    * for malformed/truncated streams (chunk walk as [[WavHeaders.parse]],
    * plus the data chunk's byte OFFSET so samples can be read).
    */
  private def locate(p: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = {
    if (p == null || p.length < 44 || !tag(p, 0, "RIFF") || !tag(p, 8, "WAVE"))
      return None
    // The chunk walk stays in Long: a declared size near 2^31 would wrap
    // an Int cursor negative and defeat every bounds check downstream
    // (same overflow class as BmpPixels.header) — reject before casting.
    var i = 12L
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (i + 8 <= p.length && (fmt.isEmpty || data.isEmpty)) {
      val ii = i.toInt
      val size = le32(p, ii + 4)
      if (size < 0 || size > Int.MaxValue - 8) return None
      if (tag(p, ii, "fmt ")) {
        // size < 16 would read channels/rate/bits from the next chunk's
        // bytes — bounds-safe but garbage; the PCM fmt layout is ≥ 16
        if (i + 8 + 16 > p.length || size < 16) return None
        // the documented contract: ONLY format tag 1 (integer PCM)
        // decodes — extensible (0xFFFE) / compressed streams are not PCM
        // even when channels/bits look right, so reject, don't garble.
        val fmtTag = le16(p, ii + 8)
        if (fmtTag != 1) return None
        val channels = le16(p, ii + 10)
        val rate = le32(p, ii + 12)
        val bits = le16(p, ii + 22)
        if (channels < 1 || rate < 1 || rate > Int.MaxValue || bits < 1) return None
        fmt = Some((channels, rate.toInt, bits))
      } else if (tag(p, ii, "data")) {
        if (i + 8 + size > p.length) return None
        data = Some((ii + 8, size.toInt))
      }
      i += 8L + size + (size & 1L)
    }
    for ((c, r, b) <- fmt; (off, n) <- data) yield (c, r, b, off, n)
  }

  /** Exact per-window statistics over a mono 16-bit PCM payload: window
    * w covers samples [w·windowSamples, (w+1)·windowSamples); the last
    * window may be short. None unless the stream is strictly mono 16-bit
    * PCM with the full data chunk present.
    */
  def pcm16WindowStats(p: Array[Byte], windowSamples: Int): Option[Seq[WindowStats]] =
    locate(p).flatMap { case (channels, _, bits, off, len) =>
      if (channels != 1 || bits != 16 || (len & 1) != 0 ||
          off.toLong + len > p.length || windowSamples <= 0) None
      else {
        val n = len / 2
        val out = scala.collection.mutable.ArrayBuffer.empty[WindowStats]
        var w = 0
        var i = 0
        while (i < n) {
          val end = math.min(i + windowSamples, n)
          var sum = 0L
          var sq = 0L
          var j = i
          while (j < end) {
            val s = le16(p, off + 2 * j).toShort.toInt
            sum += s
            sq += s.toLong * s
            j += 1
          }
          out += WindowStats(w, end - i, sum, sq)
          w += 1
          i = end
        }
        Some(out.toSeq)
      }
    }

  /** Deterministic mono 16-bit PCM builder for fixtures/specs:
    * `pcm16WindowStats(wavPcm16(rate, samples), w)` reproduces the
    * sample statistics of `samples` by construction.
    */
  def wavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataBytes = samples.length * 2
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit =
      (0 until 4).foreach(j => out.write(((v >> (8 * j)) & 0xff).toInt))
    def t(s: String): Unit = s.foreach(c => out.write(c.toInt))
    t("RIFF"); w32(36L + dataBytes); t("WAVE")
    t("fmt "); w32(16L); w16(1); w16(1); w32(sampleRate.toLong)
    w32(sampleRate.toLong * 2); w16(2); w16(16)
    t("data"); w32(dataBytes.toLong)
    samples.foreach(s => w16(s & 0xffff))
    out.toByteArray
  }
}
