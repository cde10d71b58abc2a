package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.PdfText

/** PDF extraction contract: object scan, Flate inflate, content
  * tokenizer (strings with nesting/escapes/octal/hex/UTF-16), text
  * operators, multi-page ordering, leniency.
  */
class PdfSpec extends AnyFunSuite {

  test("round trip: multi-line, multi-page, flate and plain") {
    val pages = Seq(
      Seq("first line", "second line", "third has TJ split", "fourth"),
      Seq("page two a", "page two b"))
    for (flate <- Seq(false, true)) {
      val pdf = PdfText.pdfBytes(pages, flate)
      assert(PdfText.extractText(pdf) ===
        "first line\nsecond line\nthird has TJ split\nfourth\n" +
          "page two a\npage two b", s"flate=$flate")
    }
  }

  test("string escapes: parens, backslash, octal, nesting") {
    val lines = Seq("""a (nested) and \ backslash""", "par(en")
    val pdf = PdfText.pdfBytes(Seq(lines), flate = true)
    assert(PdfText.extractText(pdf) === """a (nested) and \ backslash""" + "\npar(en")
  }

  test("hand-built content: hex strings, UTF-16 BOM, quote operator, Tm break") {
    val content = "BT /F1 12 Tf 72 720 Td (plain) Tj " +
      "<48 65 6C6C 6F> Tj " + // "Hello" with whitespace in hex
      "1 0 0 1 72 700 Tm (after tm) Tj " +
      "(next via quote) ' " +
      "(\\376\\377\\000A\\000B) Tj ET" // UTF-16BE "AB"
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Length " + content.length +
      " >>\nstream\n" + content + "\nendstream\nendobj\n%%EOF")
      .getBytes("ISO-8859-1")
    assert(PdfText.extractText(pdf) === "plainHello\nafter tm\nnext via quoteAB")
  }

  test("unicode lines ride UTF-16BE hex strings, astral-safe TJ split") {
    val lines = Seq("русский текст", "日本語のテキスト", "emoji 😀😀 line",
      "mixed 中文 and ASCII")
    for (flate <- Seq(false, true)) {
      val pdf = PdfText.pdfBytes(Seq(lines), flate)
      assert(PdfText.extractText(pdf) === lines.mkString("\n"), s"flate=$flate")
    }
  }

  test("whitespace collapses per line; empty lines drop") {
    val content = "BT ( a   b\t c ) Tj 0 -14 Td (   ) Tj 0 -14 Td (x) Tj ET"
    val pdf = ("%PDF-1.4\n1 0 obj\n<< >>\nstream\n" + content +
      "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    assert(PdfText.extractText(pdf) === "a b c\nx")
  }

  test("declared /Length is not trusted; endstream scan is authoritative") {
    val content = "BT (t) Tj ET"
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Length 99999 >>\nstream\n" + content +
      "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    assert(PdfText.extractText(pdf) === "t")
  }

  test("non-flate filters and corrupt flate streams are skipped, not fatal") {
    val good = PdfText.pdfBytes(Seq(Seq("kept")), flate = false)
    val withBad = ("%PDF-1.4\n9 0 obj\n<< /Filter /DCTDecode >>\nstream\n" +
      "\nendstream\nendobj\n" +
      "8 0 obj\n<< /Filter /FlateDecode >>\nstream\nnotflate\nendstream\nendobj\n")
      .getBytes("ISO-8859-1") ++ good.drop(9) // keep single %PDF- header
    assert(PdfText.extractText("%PDF-1.4\n".getBytes("ISO-8859-1") ++ withBad)
      .contains("kept"))
  }

  test("lenient on garbage: no header, truncation, nulls") {
    assert(PdfText.extractText(null) === null)
    assert(PdfText.extractText(Array.empty[Byte]) === "")
    assert(PdfText.extractText("not a pdf at all".getBytes) === "")
    val pdf = PdfText.pdfBytes(Seq(Seq("abc", "def")), flate = true)
    (0 until pdf.length by 7).foreach { n =>
      PdfText.extractText(java.util.Arrays.copyOf(pdf, n)) // must not throw
    }
  }

  test("fuzz: byte mutations never crash") {
    val pdf = PdfText.pdfBytes(Seq(Seq("alpha beta", "gamma")), flate = true)
    val rnd = new scala.util.Random(11)
    (0 until 300).foreach { _ =>
      val m = pdf.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        m(rnd.nextInt(m.length)) = (rnd.nextInt(256) - 128).toByte
      }
      PdfText.extractText(m)
    }
  }
}
