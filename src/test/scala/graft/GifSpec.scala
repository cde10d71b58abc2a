package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GifPixels
import graft.ops.GifPixels.{FrameSpec, FrameStats}

/** GIF codec laws: LZW round-trip (incl. width growth, KwKwK, interior
  * clears, full-table behavior), interlace reorder, compositing with
  * transparency + disposal, and the strict-recognizer rejections.
  */
class GifSpec extends AnyFunSuite {

  private val pal16: IndexedSeq[(Int, Int, Int)] =
    IndexedSeq.tabulate(16)(i => (i * 17, (i * 29) % 256, (i * 41) % 256))

  /** Reference composite computed naively, mirroring the documented
    * contract: bg-initialized canvas, draw (skip transparent), stats
    * after draw, disposal 2 restores rect to bg.
    */
  private def referenceStats(w: Int, h: Int, pal: IndexedSeq[(Int, Int, Int)],
      bgIndex: Int, frames: Seq[FrameSpec]): Vector[(Long, Long, Long)] = {
    val canvas = Array.fill(w * h)(pal(bgIndex))
    frames.toVector.map { f =>
      for (y <- f.top until f.top + f.fh; x <- f.left until f.left + f.fw) {
        val v = f.pix(x, y)
        if (v != f.transparentIndex) canvas(y * w + x) = pal(v)
      }
      val sums = canvas.foldLeft((0L, 0L, 0L)) { case ((r, g, b), c) =>
        (r + c._1, g + c._2, b + c._3)
      }
      if (f.disposal == 2)
        for (y <- f.top until f.top + f.fh; x <- f.left until f.left + f.fw)
          canvas(y * w + x) = pal(bgIndex)
      sums
    }
  }

  private def check(w: Int, h: Int, bgIndex: Int, frames: Seq[FrameSpec],
      clearEvery: Int = 0): Vector[FrameStats] = {
    val bytes = GifPixels.gifBytes(w, h, pal16, bgIndex, frames, clearEvery)
    val gif = GifPixels.decode(bytes).getOrElse(fail("decode returned None"))
    assert(gif.width === w && gif.height === h)
    val expect = referenceStats(w, h, pal16, bgIndex, frames)
    assert(gif.frames.map(f => (f.sumR, f.sumG, f.sumB)) === expect)
    gif.frames
  }

  test("single full-canvas frame round-trips exactly") {
    check(13, 9, 0, Seq(FrameSpec(0, 0, 13, 9, (x, y) => (x * 3 + y * 7) % 16)))
  }

  test("interlaced frame decodes to the same pixels as sequential") {
    val pix = (x: Int, y: Int) => (x * 5 + y * 11) % 16
    val a = check(17, 23, 1, Seq(FrameSpec(0, 0, 17, 23, pix)))
    val b = check(17, 23, 1, Seq(FrameSpec(0, 0, 17, 23, pix, interlace = true)))
    assert(a.map(f => (f.sumR, f.sumG, f.sumB)) ===
      b.map(f => (f.sumR, f.sumG, f.sumB)))
    assert(b.head.interlaced)
  }

  test("animation: nested shrinking rects composite over prior frames") {
    val frames = (0 until 5).map(f => FrameSpec(f, f, 12 - f, 10 - f,
      (x, y) => (x * 3 + y * 7 + f * 13) % 16, delayCs = f * 4 + 2))
    val got = check(12, 10, 3, frames)
    assert(got.map(_.delayCs) === Vector(2, 6, 10, 14, 18))
    assert(got.map(_.idx) === Vector(0, 1, 2, 3, 4))
  }

  test("transparent pixels leave the underlying canvas untouched") {
    // frame 0 paints all 7s; frame 1 paints checkerboard of 2s and
    // transparent 5s — transparent cells must still read 7
    check(8, 8, 0, Seq(
      FrameSpec(0, 0, 8, 8, (_, _) => 7),
      FrameSpec(0, 0, 8, 8, (x, y) => if ((x + y) % 2 == 0) 2 else 5,
        transparentIndex = 5)))
  }

  test("disposal 2 restores the frame rect to background before the next frame") {
    check(10, 6, 4, Seq(
      FrameSpec(2, 1, 6, 4, (_, _) => 9, disposal = 2),
      FrameSpec(0, 0, 3, 3, (x, y) => (x + y) % 16)))
  }

  test("interior clears (clearEvery) change the bitstream, not the pixels") {
    val pix = (x: Int, y: Int) => (x * x + y * 3) % 16
    val plain = GifPixels.gifBytes(31, 19, pal16, 0,
      Seq(FrameSpec(0, 0, 31, 19, pix)))
    val cleared = GifPixels.gifBytes(31, 19, pal16, 0,
      Seq(FrameSpec(0, 0, 31, 19, pix)), clearEvery = 7)
    assert(!plain.sameElements(cleared))
    check(31, 19, 0, Seq(FrameSpec(0, 0, 31, 19, pix)), clearEvery = 7)
  }

  test("KwKwK: a constant-color image exercises code==next and round-trips") {
    check(40, 30, 0, Seq(FrameSpec(0, 0, 40, 30, (_, _) => 6)))
  }

  test("code width growth past 9/10/11 bits and a full-table clear") {
    // 300×200 varied pixels force thousands of dict entries (table fills
    // at 4096 → encoder emits clear, decoder resets mid-frame)
    val pix = (x: Int, y: Int) => ((x * 7919 + y * 104729) >> 3) % 16
    check(300, 200, 0, Seq(FrameSpec(0, 0, 300, 200, pix)))
  }

  test("strict recognizer rejections") {
    val good = GifPixels.gifBytes(8, 8, pal16, 0,
      Seq(FrameSpec(0, 0, 8, 8, (x, y) => (x + y) % 16)))
    assert(GifPixels.decode(good).isDefined)
    assert(GifPixels.decode(null).isEmpty)
    assert(GifPixels.decode(Array.empty[Byte]).isEmpty)
    assert(GifPixels.decode("GIF89a".getBytes("US-ASCII")).isEmpty)
    assert(GifPixels.decode(good.dropRight(1)).isEmpty, "missing trailer")
    assert(GifPixels.decode(good :+ 0.toByte).isEmpty, "bytes after trailer")
    assert(GifPixels.decode(good.dropRight(8)).isEmpty, "truncated LZW data")
    // disposal 3 (restore previous) is out of contract
    val d3 = good.clone()
    val gceIdx = good.indexOfSlice(Seq(0x21.toByte, 0xf9.toByte))
    d3(gceIdx + 3) = (3 << 2).toByte
    assert(GifPixels.decode(d3).isEmpty)
    // canvas bound: 4 MPx guard
    val big = GifPixels.gifBytes(3000, 1400, pal16, 0,
      Seq(FrameSpec(0, 0, 1, 1, (_, _) => 0)))
    assert(GifPixels.decode(big).isEmpty)
  }

  test("palette-range violation inside LZW output rejects") {
    // encode with a 16-entry palette claim but emit index 9 via a
    // 4-entry palette header: hand-shrink the GCT declaration
    val bytes = GifPixels.gifBytes(4, 4, pal16, 0,
      Seq(FrameSpec(0, 0, 4, 4, (_, _) => 9)))
    assert(GifPixels.decode(bytes).isDefined)
    // flip the LSD packed field from 16-entry (size 3) to 4-entry (size 1)
    // → table shorter AND the offsets shift; a strict decoder must reject
    // rather than read a stale index. Rebuild properly instead: a real
    // 4-color gif whose stream contains code 9 cannot be produced by the
    // encoder, so tamper at the bit level: reuse the 16-color stream but
    // declare minCode 2 — codes reinterpret and either violate the
    // palette or the framing.
    val mc = bytes.indexWhere(_ == 0x2c.toByte)
    val minCodeIdx = mc + 10
    val tampered = bytes.clone()
    tampered(minCodeIdx) = 2
    assert(GifPixels.decode(tampered).isEmpty)
  }

  test("fuzz: bit flips never crash — None or a valid decode") {
    val base = GifPixels.gifBytes(16, 12, pal16, 2, Seq(
      FrameSpec(0, 0, 16, 12, (x, y) => (x * 3 + y) % 16),
      FrameSpec(2, 2, 9, 7, (x, y) => (x + y * 5) % 16, interlace = true,
        transparentIndex = 1)))
    val rnd = new scala.util.Random(42)
    (0 until 500).foreach { _ =>
      val m = base.clone()
      val flips = 1 + rnd.nextInt(4)
      (0 until flips).foreach { _ =>
        val i = rnd.nextInt(m.length)
        m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
      }
      GifPixels.decode(m) // must not throw
    }
  }
}
