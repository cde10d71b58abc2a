package graft.ops

import java.io.ByteArrayOutputStream

/** MPEG-audio (MP3) frame-HEADER walk — the metadata path the audio
  * coverage row promises for lossy codecs: no DSP, no patent-era
  * synthesis filterbank, just the public ISO 11172-3 / 13818-3 frame
  * framing, which is enough for the corpus questions (duration, rate,
  * layer, VBR profile) a pipeline asks before deciding whether to ship
  * a payload to a real decoder. Completes the audio stack next to
  * [[WavPcm]] (PCM) and [[FlacPcm]] (lossless decode).
  *
  * Strict recognizer: an optional ID3v2 prefix (synchsafe size) is
  * skipped, then EVERY frame must parse — 11-bit sync, known version /
  * layer / bitrate-index / sample-rate-index, no free-format, frame
  * length from the spec formula, stream ends exactly at a frame
  * boundary (an optional 128-byte ID3v1 tail allowed). Mid-stream
  * garbage or truncation returns None rather than a guess — real
  * pipelines quarantine those payloads.
  *
  * Duration is reported EXACTLY as (totalSamples, sampleRate) — a
  * rational, never a rounded float — so the oracle reproduces it with
  * integer arithmetic. Mixed sample rates across frames reject (out of
  * contract); mixed bitrates (VBR) are the normal case and sum exactly.
  */
object Mp3Headers {

  final case class Mp3Info(version: String, layer: Int, sampleRate: Int,
      channels: Int, nFrames: Long, nSamples: Long, sumBitrateKbps: Long,
      id3v2: Boolean, id3v1: Boolean)

  // bitrate tables (kbps), index 1..14; 0 = free format (rejected),
  // 15 = bad. Rows: (version group, layer).
  private val BitrateV1L1 =
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val BitrateV1L2 =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BitrateV2L1 =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val BitrateV2L23 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private val RatesV1 = Array(44100, 48000, 32000)
  private val RatesV2 = Array(22050, 24000, 16000)
  private val RatesV25 = Array(11025, 12000, 8000)

  /** Parse one frame header at `i`; returns (frameLen, samples,
    * sampleRate, bitrateKbps, channels, versionName, layer) or null.
    */
  private def frame(p: Array[Byte], i: Int): Array[Long] = {
    if (i + 4 > p.length) return null
    val b1 = p(i) & 0xff; val b2 = p(i + 1) & 0xff
    val b3 = p(i + 2) & 0xff; val b4 = p(i + 3) & 0xff
    if (b1 != 0xff || (b2 & 0xe0) != 0xe0) return null
    val versionBits = (b2 >> 3) & 3 // 0=2.5, 1=reserved, 2=2, 3=1
    val layerBits = (b2 >> 1) & 3 // 0=reserved, 1=III, 2=II, 3=I
    if (versionBits == 1 || layerBits == 0) return null
    val layer = 4 - layerBits // 1, 2, 3
    val bitrateIdx = (b3 >> 4) & 15
    val rateIdx = (b3 >> 2) & 3
    if (bitrateIdx == 0 || bitrateIdx == 15 || rateIdx == 3) return null
    val padding = (b3 >> 1) & 1
    val channelMode = (b4 >> 6) & 3 // 3 = mono
    val isV1 = versionBits == 3
    val bitrate = (isV1, layer) match {
      case (true, 1) => BitrateV1L1(bitrateIdx)
      case (true, 2) => BitrateV1L2(bitrateIdx)
      case (true, _) => BitrateV1L3(bitrateIdx)
      case (false, 1) => BitrateV2L1(bitrateIdx)
      case (false, _) => BitrateV2L23(bitrateIdx)
    }
    val rate = versionBits match {
      case 3 => RatesV1(rateIdx)
      case 2 => RatesV2(rateIdx)
      case _ => RatesV25(rateIdx)
    }
    val samples =
      if (layer == 1) 384L
      else if (layer == 2) 1152L
      else if (isV1) 1152L else 576L
    // frame length: L1 counts in 4-byte slots; L2/3 in bytes
    val len =
      if (layer == 1) (12L * bitrate * 1000 / rate + padding) * 4
      else samples / 8 * bitrate * 1000 / rate + padding
    val version = if (isV1) 1L else if (versionBits == 2) 2L else 25L
    Array(len, samples, rate.toLong, bitrate.toLong,
      if (channelMode == 3) 1L else 2L, version, layer.toLong)
  }

  /** Walk the whole payload; None on anything out of contract. */
  def parse(bytes: Array[Byte]): Option[Mp3Info] = {
    val p = bytes
    if (p == null || p.length < 4) return None
    var i = 0
    var id3v2 = false
    if (p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3') {
      // synchsafe 28-bit size after the 10-byte header
      if ((p(6) | p(7) | p(8) | p(9)) < 0) return None
      val size = ((p(6) & 0x7f) << 21) | ((p(7) & 0x7f) << 14) |
        ((p(8) & 0x7f) << 7) | (p(9) & 0x7f)
      i = 10 + size
      id3v2 = true
      if (i >= p.length) return None
    }
    var end = p.length
    var id3v1 = false
    if (end - i >= 128 && p(end - 128) == 'T' && p(end - 127) == 'A' &&
        p(end - 126) == 'G') {
      end -= 128
      id3v1 = true
    }
    var nFrames = 0L
    var nSamples = 0L
    var sumKbps = 0L
    var rate = -1L
    var channels = -1L
    var version = -1L
    var layer = -1L
    while (i < end) {
      val f = frame(p, i)
      if (f == null) return None
      if (i + f(0) > end) return None // truncated final frame
      if (rate < 0) { rate = f(2); channels = f(4); version = f(5); layer = f(6) }
      else if (rate != f(2) || version != f(5) || layer != f(6)) return None
      nFrames += 1
      nSamples += f(1)
      sumKbps += f(3)
      i += f(0).toInt
    }
    if (nFrames == 0) return None
    Some(Mp3Info(
      version = if (version == 1) "mpeg1" else if (version == 2) "mpeg2" else "mpeg2.5",
      layer = layer.toInt, sampleRate = rate.toInt, channels = channels.toInt,
      nFrames = nFrames, nSamples = nSamples, sumBitrateKbps = sumKbps,
      id3v2 = id3v2, id3v1 = id3v1))
  }

  // ---- fixture encoder (scaffolding — headers + zero payload) ----

  /** Serialize a frame sequence: MPEG1 Layer III at `rateIdx` (0=44100,
    * 1=48000, 2=32000), per-frame bitrate indices 1..14 (VBR), padding
    * flags; optional ID3v2 prefix and ID3v1 tail.
    */
  def mp3Bytes(rateIdx: Int, bitrateIdxs: Seq[Int], paddings: Seq[Boolean],
      mono: Boolean, id3v2Size: Int = -1, id3v1: Boolean = false): Array[Byte] = {
    require(bitrateIdxs.size == paddings.size)
    val out = new ByteArrayOutputStream()
    if (id3v2Size >= 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0)
      out.write((id3v2Size >> 21) & 0x7f); out.write((id3v2Size >> 14) & 0x7f)
      out.write((id3v2Size >> 7) & 0x7f); out.write(id3v2Size & 0x7f)
      out.write(new Array[Byte](id3v2Size))
    }
    val rate = RatesV1(rateIdx)
    bitrateIdxs.zip(paddings).foreach { case (bi, pad) =>
      require(bi >= 1 && bi <= 14)
      val bitrate = BitrateV1L3(bi)
      val len = 144L * bitrate * 1000 / rate + (if (pad) 1 else 0)
      out.write(0xff)
      out.write(0xfb) // sync + MPEG1 + Layer III, no CRC
      out.write((bi << 4) | (rateIdx << 2) | (if (pad) 2 else 0))
      out.write(if (mono) 0xc0 else 0x00)
      out.write(new Array[Byte]((len - 4).toInt))
    }
    if (id3v1) {
      out.write('T'); out.write('A'); out.write('G')
      out.write(new Array[Byte](125))
    }
    out.toByteArray
  }
}
