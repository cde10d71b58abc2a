package graft.ops

/** Pure-JVM WAV (RIFF/WAVE) *header* decode — channel count, sample rate,
  * bit depth, and exact data length from the first bytes of a payload,
  * per the public RIFF/WAVE spec (Microsoft/IBM RIFF 1991; fmt chunk
  * layout). Never touches sample data, so it is the audio twin of
  * [[ImageHeaders]]: a few dozen bytes read per record regardless of
  * payload size — the right shape for a 100 TB profiling pass.
  *
  * Also provides a deterministic builder for minimal valid byte streams
  * (fixtures/specs): `parse(wavBytes(c, r, b, n))` round-trips by
  * construction.
  */
object WavHeaders {

  private def u8(b: Byte): Int = b & 0xff
  private def le16(p: Array[Byte], i: Int): Int = u8(p(i)) | (u8(p(i + 1)) << 8)
  private def le32(p: Array[Byte], i: Int): Long =
    u8(p(i)).toLong | (u8(p(i + 1)).toLong << 8) |
      (u8(p(i + 2)).toLong << 16) | (u8(p(i + 3)).toLong << 24)

  private def tag(p: Array[Byte], i: Int, s: String): Boolean =
    p.length >= i + 4 && (0 until 4).forall(j => p(i + j) == s.charAt(j).toByte)

  /** Parse a RIFF/WAVE header: walks chunks after the 12-byte RIFF
    * preamble to find `fmt ` (channels, sample rate, bits) and `data`
    * (byte length). Returns
    * `Some((channels, sampleRate, bitsPerSample, dataBytes))` or None for
    * anything malformed/truncated (bad records fall to the caller's
    * fallback, they don't fail the task).
    */
  def parse(payload: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (payload == null || payload.length < 44 ||
        !tag(payload, 0, "RIFF") || !tag(payload, 8, "WAVE")) return None
    // The chunk walk stays in Long: a declared size near 2^31 would wrap
    // an Int cursor negative and defeat every bounds check downstream —
    // same overflow class (and same fix) as [[WavPcm.locate]].
    var i = 12L
    var fmt: Option[(Int, Int, Int)] = None
    var dataLen: Option[Long] = None
    while (i + 8 <= payload.length && (fmt.isEmpty || dataLen.isEmpty)) {
      val ii = i.toInt
      val size = le32(payload, ii + 4)
      if (size < 0 || size > Int.MaxValue - 8) return None
      if (tag(payload, ii, "fmt ")) {
        // a declared fmt size below the 16-byte PCM layout means the
        // channel/rate/bits reads would land in the NEXT chunk's bytes —
        // bounds-safe but garbage; reject instead of misparsing
        if (i + 8 + 16 > payload.length || size < 16) return None
        val channels = le16(payload, ii + 10)
        val rate = le32(payload, ii + 12)
        val bits = le16(payload, ii + 22)
        if (channels < 1 || rate < 1 || rate > Int.MaxValue || bits < 1) return None
        fmt = Some((channels, rate.toInt, bits))
      } else if (tag(payload, ii, "data")) {
        dataLen = Some(size)
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      i += 8L + size + (size & 1L)
    }
    for ((c, r, b) <- fmt; n <- dataLen) yield (c, r, b, n)
  }

  /** Minimal valid PCM WAV byte stream: 44-byte canonical header plus
    * `dataBytes` zero samples (capped — fixtures need headers, not audio).
    */
  def wavBytes(channels: Int, sampleRate: Int, bitsPerSample: Int,
      dataBytes: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val byteRate = sampleRate * blockAlign
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = (0 until 4).foreach(j => out.write(((v >> (8 * j)) & 0xff).toInt))
    def tag(s: String): Unit = s.foreach(c => out.write(c.toInt))
    tag("RIFF"); w32(36L + dataBytes); tag("WAVE")
    tag("fmt "); w32(16L); w16(1); w16(channels); w32(sampleRate.toLong)
    w32(byteRate.toLong); w16(blockAlign); w16(bitsPerSample)
    tag("data"); w32(dataBytes.toLong)
    out.write(new Array[Byte](math.min(dataBytes, 64)))
    out.toByteArray
  }
}
