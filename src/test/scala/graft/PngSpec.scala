package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PngPixels

/** PngPixels laws: the builder round-trips through REAL zlib + all five
  * scanline filters (rows are filtered y % 5 at encode), strictness of the
  * recognizer, and the malformed-payload → None contract.
  */
class PngSpec extends AnyFunSuite {

  private def expectedSums(w: Int, h: Int,
      f: (Int, Int) => (Int, Int, Int)): (Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      sr += r & 0xff; sg += g & 0xff; sb += b & 0xff
    }
    (sr, sg, sb)
  }

  test("round-trip across a dimension grid exercises every filter type") {
    // h >= 5 rows covers filters 0..4 (encode uses y % 5)
    for (w <- Seq(1, 2, 7, 16); h <- Seq(1, 5, 11)) {
      val f = (x: Int, y: Int) => (x * 5 + y * 13, x * 5 + y * 13 + 2, x * 5 + y * 13 + 4)
      val st = PngPixels.decode(PngPixels.pngBytes(w, h, f))
        .getOrElse(fail(s"decode failed at ${w}x$h"))
      val (sr, sg, sb) = expectedSums(w, h, f)
      assert((st.width, st.height, st.channels, st.nPx) === ((w, h, 3, w.toLong * h)))
      assert((st.sumR, st.sumG, st.sumB) === ((sr, sg, sb)), s"${w}x$h")
    }
  }

  test("high-entropy pixels round-trip (filters give no compression win)") {
    val f = (x: Int, y: Int) => {
      val v = (x * 2654435761L + y * 40503L).toInt
      (v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff)
    }
    val st = PngPixels.decode(PngPixels.pngBytes(13, 9, f)).get
    assert((st.sumR, st.sumG, st.sumB) === expectedSums(13, 9, f))
  }

  /** Minimal 8-bit GREYSCALE PNG via the same chunk mechanics (the builder
    * only emits truecolour, so grey coverage is hand-assembled here).
    */
  private def greyPng(w: Int, h: Int, f: (Int, Int) => Int,
      tweakIhdr: Array[Byte] => Unit = _ => (),
      filterByte: Int => Int = _ => 0): Array[Byte] = {
    val raw = new Array[Byte]((w + 1) * h)
    for (y <- 0 until h) {
      raw(y * (w + 1)) = filterByte(y).toByte
      for (x <- 0 until w) raw(y * (w + 1) + 1 + x) = (f(x, y) & 0xff).toByte
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val z = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!d.finished()) z.write(tmp, 0, d.deflate(tmp))
    d.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a), 0, 8)
    def chunk(t: String, data: Array[Byte]): Unit = {
      def w32(v: Long): Unit =
        (3 to 0 by -1).foreach(s => out.write(((v >> (8 * s)) & 0xff).toInt))
      w32(data.length.toLong)
      out.write(t.getBytes("US-ASCII"), 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32
      crc.update(t.getBytes("US-ASCII")); crc.update(data)
      w32(crc.getValue)
    }
    val ihdr = new Array[Byte](13)
    def be(v: Int, off: Int): Unit =
      (0 until 4).foreach(s => ihdr(off + s) = ((v >> (8 * (3 - s))) & 0xff).toByte)
    be(w, 0); be(h, 4); ihdr(8) = 8; ihdr(9) = 0 // grey
    tweakIhdr(ihdr)
    chunk("IHDR", ihdr)
    chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("greyscale decodes with the single channel mirrored to all sums") {
    val st = PngPixels.decode(greyPng(6, 4, (x, y) => x + 10 * y)).get
    assert(st.channels === 1)
    val expect = (for (y <- 0 until 4; x <- 0 until 6) yield x + 10 * y).sum.toLong
    assert((st.sumR, st.sumG, st.sumB) === ((expect, expect, expect)))
  }

  test("malformed payloads return None, never throw") {
    assert(PngPixels.decode(null).isEmpty)
    assert(PngPixels.decode("not a png at all, just text!!".getBytes).isEmpty)
    val good = PngPixels.pngBytes(5, 5, (x, y) => (x, y, x + y))
    assert(PngPixels.decode(good.take(30)).isEmpty) // truncated mid-chunk
    // corrupt one IDAT byte: CRC validation must reject it
    val corrupt = good.clone()
    corrupt(8 + 25 + 8 + 2) = (corrupt(8 + 25 + 8 + 2) ^ 0x40).toByte
    assert(PngPixels.decode(corrupt).isEmpty)
    // huge declared chunk length must not wrap the cursor or bounds math
    val huge = good.clone()
    huge(8) = 0x7f; huge(9) = 0xff.toByte; huge(10) = 0xff.toByte; huge(11) = 0xf0.toByte
    assert(PngPixels.decode(huge).isEmpty)
  }

  test("strictness: 16-bit, palette, interlaced, and bad filter bytes are rejected") {
    assert(PngPixels.decode(greyPng(4, 4, (x, y) => x + y,
      tweakIhdr = h => h(8) = 16)).isEmpty) // bit depth 16
    assert(PngPixels.decode(greyPng(4, 4, (x, y) => x + y,
      tweakIhdr = h => h(9) = 3)).isEmpty) // palette
    assert(PngPixels.decode(greyPng(4, 4, (x, y) => x + y,
      tweakIhdr = h => h(12) = 1)).isEmpty) // Adam7 interlace
    assert(PngPixels.decode(greyPng(4, 4, (x, y) => x + y,
      filterByte = _ => 7)).isEmpty) // undefined filter type
  }

  test("property: round-trip sums hold for arbitrary dims and pixel fields") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genDims = for {
      w <- Gen.choose(1, 24); h <- Gen.choose(1, 18)
      a <- Gen.choose(0, 19); b <- Gen.choose(0, 29); c <- Gen.choose(0, 255)
    } yield (w, h, a, b, c)
    val p = Prop.forAll(genDims) { case (w, h, a, b, c) =>
      val f = (x: Int, y: Int) =>
        ((x * a + y * b + c) % 256, (x * b + y * c + a) % 256, (x * c + y * a + b) % 256)
      val st = PngPixels.decode(PngPixels.pngBytes(w, h, f)).get
      val (sr, sg, sb) = expectedSums(w, h, f)
      st.width == w && st.height == h &&
        st.sumR == sr && st.sumG == sg && st.sumB == sb
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(150), p)
    assert(res.passed, s"png round-trip falsified: ${res.status}")
  }

  test("property: truncations and single-bit flips never throw") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val base = PngPixels.pngBytes(9, 7, (x, y) => (x * 3, y * 5, x + y))
    val gen = for {
      cut <- Gen.choose(0, base.length)
      flipAt <- Gen.choose(0, math.max(0, cut - 1))
      bit <- Gen.choose(0, 7)
    } yield (cut, flipAt, bit)
    val p = Prop.forAll(gen) { case (cut, flipAt, bit) =>
      val mut = base.take(cut)
      if (mut.nonEmpty) mut(flipAt) = (mut(flipAt) ^ (1 << bit)).toByte
      PngPixels.decode(mut) // must return (Some or None), never throw
      true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"png fuzz falsified: ${res.status}")
  }

  test("inflated size must match IHDR geometry exactly") {
    // declare 4x4 but carry 4x3 worth of scanlines: short data → None
    val shortData = greyPng(4, 3, (x, y) => x + y,
      tweakIhdr = h => h(7) = 4) // height field low byte: 3 → 4
    assert(PngPixels.decode(shortData).isEmpty)
  }
}
