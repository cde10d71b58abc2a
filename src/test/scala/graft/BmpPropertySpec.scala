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
