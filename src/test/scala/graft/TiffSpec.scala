package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TiffPixels

/** TIFF codec laws: IFD walk (both byte orders via the encoder's II),
  * strips, TIFF-LZW with the early width change, predictor 2, and the
  * strict-recognizer rejections.
  */
class TiffSpec extends AnyFunSuite {

  private def sums(w: Int, h: Int, channels: Int,
      pix: (Int, Int) => (Int, Int, Int)): (Long, Long, Long) = {
    var r = 0L; var g = 0L; var b = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (pr, pg, pb) = pix(x, y)
      if (channels == 1) { r += pr & 0xff; g += pr & 0xff; b += pr & 0xff }
      else { r += pr & 0xff; g += pg & 0xff; b += pb & 0xff }
    }
    (r, g, b)
  }

  private def roundTrip(w: Int, h: Int, channels: Int, lzw: Boolean,
      predictor2: Boolean = false, rps: Int = Int.MaxValue): Unit = {
    val pix = (x: Int, y: Int) =>
      ((x * 7 + y * 3) % 256, (x * 5 + y * 11) % 256, (x * 13 + y) % 256)
    val bytes = TiffPixels.tiffBytes(w, h, channels, pix, lzw, predictor2, rps)
    val got = TiffPixels.decode(bytes)
      .getOrElse(fail(s"decode None (w=$w h=$h ch=$channels lzw=$lzw " +
        s"pred=$predictor2 rps=$rps)"))
    assert(got.width === w && got.height === h && got.channels === channels)
    assert((got.sumR, got.sumG, got.sumB) === sums(w, h, channels, pix))
  }

  test("uncompressed grey and RGB round-trip (single strip)") {
    roundTrip(13, 9, 1, lzw = false)
    roundTrip(17, 11, 3, lzw = false)
    roundTrip(1, 1, 3, lzw = false)
  }

  test("LZW round-trips, including width growth past 9/10/11 bits " +
      "and a full-table clear") {
    roundTrip(13, 9, 1, lzw = true)
    roundTrip(200, 150, 3, lzw = true) // 90k bytes → multiple width bumps + clear
  }

  test("predictor 2 (horizontal differencing) under LZW") {
    roundTrip(31, 17, 3, lzw = true, predictor2 = true)
    roundTrip(31, 17, 1, lzw = true, predictor2 = true)
  }

  test("multi-strip layout with offset/count arrays") {
    roundTrip(19, 23, 3, lzw = true, rps = 5)
    roundTrip(19, 23, 1, lzw = false, rps = 4)
  }

  test("strict recognizer rejections") {
    val good = TiffPixels.tiffBytes(8, 8, 3,
      (x, y) => (x, y, x + y), lzw = true)
    assert(TiffPixels.decode(good).isDefined)
    assert(TiffPixels.decode(null).isEmpty)
    assert(TiffPixels.decode("II*no".getBytes).isEmpty)
    assert(TiffPixels.decode(good.dropRight(6)).isEmpty, "truncated strip data")
    // flip compression tag value to 7 (JPEG-in-TIFF) → reject
    val bad = good.clone()
    // find tag 259 in the IFD (offset 8: count at 8..9, entries from 10)
    val nTags = (bad(8) & 0xff) | ((bad(9) & 0xff) << 8)
    val e = (0 until nTags).map(10 + _ * 12)
      .find(o => ((bad(o) & 0xff) | ((bad(o + 1) & 0xff) << 8)) == 259).get
    bad(e + 8) = 7
    assert(TiffPixels.decode(bad).isEmpty)
  }

  test("fuzz: byte mutations never crash") {
    val base = TiffPixels.tiffBytes(12, 10, 3,
      (x, y) => (x * 3, y * 5, x + y), lzw = true, predictor2 = true)
    val rnd = new scala.util.Random(23)
    (0 until 400).foreach { _ =>
      val m = base.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      }
      TiffPixels.decode(m)
    }
    (0 until base.length by 5).foreach { k =>
      TiffPixels.decode(java.util.Arrays.copyOf(base, k))
    }
  }
}
