package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.FlacPcm

/** FLAC decode: lossless round trips across every subframe strategy and
  * stereo assignment the fixture encoder cycles, plus the strict-
  * recognizer rejections (CRC damage, truncation, count mismatch).
  */
class FlacSpec extends AnyFunSuite {

  private def mono(n: Int, id: Long): Array[Int] =
    Array.tabulate(n)(i => (((i.toLong * 37 + id) % 2001) - 1000).toInt)
  private def ch2(n: Int, id: Long): Array[Int] =
    Array.tabulate(n)(i => (((i.toLong * 53 + 2 * id) % 1801) - 900).toInt)

  test("mono round trip is bit-exact across block counts") {
    // n spans 1..~400: single-frame, partial-last-frame, many-frame — and
    // with blockSize 64 the frame counter cycles all 7 subframe modes
    for (n <- Seq(1, 3, 63, 64, 65, 200, 399)) {
      val s = mono(n, n)
      val enc = FlacPcm.flacEncode16(8000, Array(s))
      val dec = FlacPcm.decode(enc)
      assert(dec.isDefined, s"n=$n failed to decode")
      val a = dec.get
      assert(a.channels === 1 && a.sampleRate === 8000 && a.bits === 16)
      assert(a.samples(0).toSeq === s.toSeq, s"n=$n samples differ")
    }
  }

  test("stereo round trip exercises all four channel assignments bit-exactly") {
    // 6 frames of 64 → assignments cycle independent, L/S, R/S, M/S and
    // the subframe modes cycle through fixed 0-4, verbatim, and LPC
    val n = 384
    val l = mono(n, 7)
    val r = ch2(n, 7)
    val enc = FlacPcm.flacEncode16(16000, Array(l, r))
    val dec = FlacPcm.decode(enc)
    assert(dec.isDefined)
    assert(dec.get.samples(0).toSeq === l.toSeq)
    assert(dec.get.samples(1).toSeq === r.toSeq)
  }

  test("extreme values and constant blocks round trip") {
    val s = Array.fill(130)(-32768) ++ Array.fill(130)(32767) ++
      Array.tabulate(130)(i => if (i % 2 == 0) -32768 else 32767)
    val enc = FlacPcm.flacEncode16(44100, Array(s))
    assert(FlacPcm.decode(enc).get.samples(0).toSeq === s.toSeq)
  }

  test("CRC damage, truncation, and count mismatch are rejected, not garbled") {
    val s = mono(300, 11)
    val enc = FlacPcm.flacEncode16(8000, Array(s))
    assert(FlacPcm.decode(enc).isDefined)
    // flip one bit in the last frame's audio bytes: CRC-16 (or MD5) must
    // catch it and the decode must refuse — never return wrong samples
    val dmg = enc.clone()
    dmg(enc.length - 20) = (dmg(enc.length - 20) ^ 0x10).toByte
    assert(FlacPcm.decode(dmg).isEmpty, "bit-flipped frame decoded")
    // truncation mid-stream
    assert(FlacPcm.decode(java.util.Arrays.copyOf(enc, enc.length / 2)).isEmpty)
    // STREAMINFO claiming more samples than the frames deliver
    val lie = enc.clone()
    // total samples is 36 bits ending at byte 8+18 of STREAMINFO (offset
    // 4 magic + 4 header + 13.5): flip a low bit of the count field
    lie(25) = (lie(25) ^ 0x01).toByte
    assert(FlacPcm.decode(lie).isEmpty, "sample-count lie decoded")
  }

  test("hostile STREAMINFO cannot demand a huge allocation") {
    val s = mono(80, 3)
    val enc = FlacPcm.flacEncode16(8000, Array(s))
    // set the 36-bit total-sample count to its max: bytes 21..25 cover
    // bits-1 tail + count; easiest is to write 0xFF over the count bytes
    val big = enc.clone()
    for (o <- 22 to 25) big(o) = 0xff.toByte
    val t0 = System.nanoTime()
    assert(FlacPcm.decode(big).isEmpty)
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "hostile header was slow")
  }
}
