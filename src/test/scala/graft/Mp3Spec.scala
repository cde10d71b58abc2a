package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Mp3Headers

/** MP3 frame-walk laws: VBR sums, padding-aware frame lengths, ID3v2/v1
  * framing, the strict rejections.
  */
class Mp3Spec extends AnyFunSuite {

  test("VBR walk: frame count, exact sample total, bitrate sum") {
    val bis = Seq(1, 9, 14, 5, 9)
    val pads = Seq(false, true, false, true, false)
    val info = Mp3Headers.parse(Mp3Headers.mp3Bytes(0, bis, pads, mono = true))
      .getOrElse(fail("parse None"))
    assert(info.version === "mpeg1" && info.layer === 3)
    assert(info.sampleRate === 44100 && info.channels === 1)
    assert(info.nFrames === 5L && info.nSamples === 5L * 1152)
    assert(info.sumBitrateKbps ===
      bis.map(Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)).sum)
    assert(!info.id3v2 && !info.id3v1)
  }

  test("ID3v2 prefix (synchsafe size) and ID3v1 tail are framed out") {
    val b = Mp3Headers.mp3Bytes(1, Seq(9, 9), Seq(false, false), mono = false,
      id3v2Size = 300, id3v1 = true)
    val info = Mp3Headers.parse(b).getOrElse(fail("parse None"))
    assert(info.id3v2 && info.id3v1)
    assert(info.sampleRate === 48000 && info.channels === 2)
    assert(info.nFrames === 2L)
  }

  test("strict: truncation, mid-stream garbage, bad indices reject") {
    val good = Mp3Headers.mp3Bytes(2, Seq(9, 9, 9), Seq(false, false, false),
      mono = true)
    assert(Mp3Headers.parse(good).isDefined)
    assert(Mp3Headers.parse(null).isEmpty)
    assert(Mp3Headers.parse(good.dropRight(1)).isEmpty, "truncated final frame")
    val garbage = good.clone()
    garbage(good.length / 2) = 0x00 // likely inside a header or payload
    // either the byte hit dead payload (still parses) or a header (rejects);
    // flipping the FIRST header always rejects:
    val broken = good.clone(); broken(1) = 0x00
    assert(Mp3Headers.parse(broken).isEmpty)
    // free-format bitrate index rejects
    val free = good.clone(); free(2) = (free(2) & 0x0f).toByte
    assert(Mp3Headers.parse(free).isEmpty)
    // non-synchsafe ID3v2 size rejects
    val id3 = Mp3Headers.mp3Bytes(0, Seq(9), Seq(false), mono = true,
      id3v2Size = 10)
    val badId3 = id3.clone(); badId3(6) = 0x80.toByte
    assert(Mp3Headers.parse(badId3).isEmpty)
  }

  test("fuzz: mutations and truncations never throw") {
    val base = Mp3Headers.mp3Bytes(0, Seq(3, 7, 11), Seq(true, false, true),
      mono = false, id3v2Size = 40, id3v1 = true)
    val rnd = new scala.util.Random(31)
    (0 until 400).foreach { _ =>
      val m = base.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      }
      Mp3Headers.parse(m)
    }
    (0 until base.length by 3).foreach(k =>
      Mp3Headers.parse(java.util.Arrays.copyOf(base, k)))
  }
}
