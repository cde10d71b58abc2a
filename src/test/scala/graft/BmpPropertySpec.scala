package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.BmpPixels

/** ScalaCheck laws for the BMP pixel decoder: decode(encode(f)) must
  * reproduce f's channel sums for ANY dimensions (padding widths included)
  * and any byte-valued pixel function, and truncating the stream anywhere
  * below the pixel array must yield None, never a throw or a partial sum.
  * Pure functions — no SparkSession.
  */
class BmpPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name falsified: ${res.status}")
  }

  private val genDims = for {
    w <- Gen.choose(1, 25)
    h <- Gen.choose(1, 20)
    a <- Gen.choose(0, 17); b <- Gen.choose(0, 23); c <- Gen.choose(0, 255)
  } yield (w, h, a, b, c)

  private def pix(a: Int, b: Int, c: Int)(x: Int, y: Int): (Int, Int, Int) =
    ((x * a + y * b + c) % 256, (x * b + y * c + a) % 256, (x * c + y * a + b) % 256)

  test("round-trip: decoded channel sums equal the generator's sums") {
    check("sum round-trip", Prop.forAll(genDims) { case (w, h, a, b, c) =>
      val f = pix(a, b, c) _
      val s = BmpPixels.decode(BmpPixels.bmpBytes(w, h, f)).get
      var er = 0L; var eg = 0L; var eb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, bl) = f(x, y); er += r; eg += g; eb += bl
      }
      s.width == w && s.height == h && s.nPx == w.toLong * h &&
        s.sumR == er && s.sumG == eg && s.sumB == eb
    })
  }

  test("aHash: uniform image hashes to all-zero bits") {
    val p = BmpPixels.bmpBytes(16, 16, (_, _) => (100, 100, 100))
    assert(BmpPixels.aHashHex(p).contains("0000000000000000"))
  }

  test("aHash: bright right half sets exactly bits 4-7 of every row byte") {
    val p = BmpPixels.bmpBytes(16, 16,
      (x, _) => if (x < 8) (0, 0, 0) else (200, 200, 200))
    assert(BmpPixels.aHashHex(p).contains("f0" * 8))
  }

  test("aHash: equals the formula reference (block cross-multiply) for any size") {
    check("aHash reference", Prop.forAll(genDims) { case (w, h, a, b, c) =>
      val f = pix(a, b, c) _
      val got = BmpPixels.aHashHex(BmpPixels.bmpBytes(w, h, f)).get
      val bSum = Array.ofDim[Long](8, 8); val bCnt = Array.ofDim[Long](8, 8)
      var total = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, bl) = f(x, y); val lum = r + g + bl
        bSum(y * 8 / h)(x * 8 / w) += lum; bCnt(y * 8 / h)(x * 8 / w) += 1
        total += lum
      }
      val nPx = w.toLong * h
      val want = (0 until 8).map { by =>
        val rb = (0 until 8).map { bx =>
          if (bSum(by)(bx) * nPx > total * bCnt(by)(bx)) 1 << bx else 0
        }.sum
        f"$rb%02x"
      }.mkString
      got == want
    })
  }

  test("WavPcm round-trip: decoded window stats equal the sample formula") {
    import graft.ops.WavPcm
    check("pcm windows", Prop.forAll(Gen.choose(1, 500), Gen.choose(1, 100),
        Gen.choose(-32768, 32767)) { (n, win, seed) =>
      val samples = Array.tabulate(n)(i => ((i * 31 + seed) % 65536 - 32768).toShort)
      val got = WavPcm.pcm16WindowStats(WavPcm.wavPcm16(8000, samples), win).get
      val want = samples.grouped(win).zipWithIndex.map { case (g, w) =>
        WavPcm.WindowStats(w, g.length,
          g.map(_.toLong).sum, g.map(s => s.toLong * s).sum)
      }.toSeq
      got == want
    })
  }

  test("WavPcm: stereo and 8-bit payloads are rejected; truncation is safe") {
    import graft.ops.{WavHeaders, WavPcm}
    assert(WavPcm.pcm16WindowStats(WavHeaders.wavBytes(2, 8000, 16, 64), 16).isEmpty)
    assert(WavPcm.pcm16WindowStats(WavHeaders.wavBytes(1, 8000, 8, 64), 16).isEmpty)
    val ok = WavPcm.wavPcm16(8000, Array.tabulate(100)(_.toShort))
    (0 until ok.length by 7).foreach { cut =>
      WavPcm.pcm16WindowStats(ok.take(cut), 16) // must never throw
    }
    assert(WavPcm.pcm16WindowStats(ok.take(50), 16).isEmpty)
  }

  test("any truncation below the pixel array decodes to None, never throws") {
    check("truncation safety", Prop.forAll(genDims, Gen.choose(0.0, 1.0)) {
      case ((w, h, a, b, c), frac) =>
        val full = BmpPixels.bmpBytes(w, h, pix(a, b, c))
        val cut = (frac * (full.length - 1)).toInt // always strictly shorter
        BmpPixels.decode(full.take(cut)).isEmpty
    })
  }

  test("garbage prefixed with 'BM' decodes to None, never throws") {
    val genBytes = Gen.choose(0, 120).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-128, 127).map(_.toByte)).map(_.toArray))
    check("garbage safety", Prop.forAll(genBytes) { tail =>
      BmpPixels.decode(Array[Byte]('B', 'M') ++ tail).forall(s =>
        // if anything decodes, its claimed pixel array must actually fit
        54L + ((s.width * 3 + 3) / 4 * 4).toLong * s.height <= 2L + tail.length)
    })
  }
}
