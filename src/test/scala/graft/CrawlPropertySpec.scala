package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CharsetSniff, GifPixels, Html, PdfText}

/** ScalaCheck laws for the r16 crawl-stack codecs — arbitrary inputs,
  * not fixture-shaped ones: GIF LZW round-trips any index plane under
  * any clear schedule; HTML escape→extract recovers any text modulo the
  * documented whitespace collapse; PDF paginate→extract→rejoin recovers
  * any word list; charset delivery modes recover any unicode string.
  * Pure functions — no SparkSession.
  */
class CrawlPropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop, n: Int = 150): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, s"$name falsified: ${res.status}")
  }

  private val pal16: IndexedSeq[(Int, Int, Int)] =
    IndexedSeq.tabulate(16)(i => (i * 17, (i * 29) % 256, (i * 41) % 256))

  test("GIF: any index plane round-trips under any clear schedule / interlace") {
    val gen = for {
      w <- Gen.choose(1, 24)
      h <- Gen.choose(1, 18)
      seed <- Gen.choose(0, Int.MaxValue)
      interlace <- Gen.oneOf(true, false)
      clearEvery <- Gen.oneOf(0, 3, 13)
    } yield (w, h, seed, interlace, clearEvery)
    check("gif-roundtrip", Prop.forAll(gen) {
      case (w, h, seed, interlace, clearEvery) =>
        val rnd = new scala.util.Random(seed)
        val plane = Array.fill(h, w)(rnd.nextInt(16))
        val bytes = GifPixels.gifBytes(w, h, pal16, 0,
          Seq(GifPixels.FrameSpec(0, 0, w, h, (x, y) => plane(y)(x),
            interlace = interlace)), clearEvery)
        val got = GifPixels.decode(bytes)
        val want = plane.flatten.foldLeft((0L, 0L, 0L)) { case ((r, g, b), i) =>
          (r + pal16(i)._1, g + pal16(i)._2, b + pal16(i)._3)
        }
        got.exists { gif =>
          val f = gif.frames.head
          (f.sumR, f.sumG, f.sumB) == want
        }
    })
  }

  private def collapseRef(s: String): String =
    s.replaceAll("[ \t\n\r\f]+", " ").trim

  // printable-ish unicode with whitespace and markup-dangerous chars
  private val genText: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '\t', '\n', '<', '>', '&', '(', ')', '\\', ';'),
    1 -> Gen.oneOf('é', 'ü', '中', '日', 'я', '€', '§')
  )).map(_.mkString)

  test("HTML: escape → extract recovers any text modulo whitespace collapse") {
    check("html-roundtrip", Prop.forAll(genText) { s =>
      Html.extractText(s"<p>${Html.escapeText(s)}</p>") == collapseRef(s)
    })
  }

  test("PDF: paginate → extract → rejoin recovers any word list") {
    val genWords = Gen.listOf(Gen.nonEmptyListOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('(', ')', '\\', '.', ','),
      1 -> Gen.oneOf('ü', '中', 'я'))).map(_.mkString))
    val gen = for {
      words <- genWords
      perLine <- Gen.choose(1, 9)
      perPage <- Gen.choose(1, 6)
      flate <- Gen.oneOf(true, false)
    } yield (words, perLine, perPage, flate)
    check("pdf-roundtrip", Prop.forAll(gen) {
      case (words, perLine, perPage, flate) =>
        val lines = words.grouped(perLine).map(_.mkString(" ")).toSeq
        val pages0 = lines.grouped(perPage).map(_.toSeq).toSeq
        val pages = if (pages0.isEmpty) Seq(Seq.empty[String]) else pages0
        val pdf = PdfText.pdfBytes(pages, flate)
        PdfText.extractText(pdf).replace("\n", " ") == words.mkString(" ")
    }, n = 100)
  }

  test("charset: every delivery mode recovers any unicode string exactly") {
    // exclude lone surrogates (Gen of valid code points via strings)
    check("charset-roundtrip", Prop.forAll(genText) { s =>
      val utf8 = s.getBytes("UTF-8")
      val bom8 = Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ utf8
      val le = Array(0xff.toByte, 0xfe.toByte) ++ s.getBytes("UTF-16LE")
      val be = Array(0xfe.toByte, 0xff.toByte) ++ s.getBytes("UTF-16BE")
      CharsetSniff.sniffDecode(utf8, "text/html; charset=utf-8")._2 == s &&
      CharsetSniff.sniffDecode(bom8, "text/html; charset=utf-16le")._2 == s &&
      CharsetSniff.sniffDecode(le, null)._2 == s &&
      CharsetSniff.sniffDecode(be, "x; charset=utf-8")._2 == s &&
      CharsetSniff.sniffDecode(utf8, null)._2 == s
    })
  }
}
