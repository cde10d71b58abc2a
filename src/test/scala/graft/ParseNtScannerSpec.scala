package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.ParseNt

/** The hand-rolled NT line scanner must be BYTE-equal to the regex of
  * record (`ParseNt.LineRe`) — on structured near-valid lines and on
  * arbitrary garbage. The regex stays in the code as the reference; this
  * differential test is what allows the hot path to not run it.
  */
class ParseNtScannerSpec extends AnyFunSuite {

  private def viaScanner(line: String): Array[String] = {
    val r = ParseNt.parseLine(UTF8String.fromString(line))
    if (r == null) null
    else Array(r.getUTF8String(0).toString, r.getUTF8String(1).toString,
      r.getUTF8String(2).toString)
  }

  private def agree(line: String): Boolean = {
    val a = ParseNt.parseLineRegex(line)
    val b = viaScanner(line)
    (a == null && b == null) || (a != null && b != null && a.sameElements(b))
  }

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), p)
    assert(res.passed, s"$name falsified: ${res.status}")
  }

  test("hand cases: tricky dots, whitespace variants, malformed shapes") {
    val cases = Seq(
      "<a> <b> <c> .",
      "  <a>  <b>  \"lit\" . ",
      "<a> <b> \"x.\" .",
      "<a> <b> a . b .",      // object contains " . "
      "<a> <b> a .. ",        // object ends in a dot
      "<a> <b> x . . ",       // trailing lone dots
      "<a> <b> \"v\"@en .",
      "<a> <b> \"v\"^^<t> .",
      "\t<s>\t<p>\tobj\t.\t",
      "<> <> . .",            // empty IRIs, dot object
      "<a> <b> .",            // empty object → malformed
      "<a> <b>  .",           // ws-only object → malformed
      "<a><b> o .",           // missing \s+ → malformed
      "<a> <b o .",           // unclosed IRI
      "a> <b> o .",           // no opening <
      "<a> <b> o",            // no final dot
      "<a> <b> o . x",        // garbage after dot
      "", " ", ".", "<", "<a> <b> o .\u00A0") // NBSP is NOT \s
    cases.foreach(c => assert(agree(c), s"disagree on: ${c.replace("\t", "\\t")}"))
  }

  test("property: scanner == regex on structured near-valid lines") {
    val token = Gen.oneOf(
      Gen.alphaNumStr.map(s => s"<$s>"),
      Gen.alphaNumStr.map(s => "\"" + s + "\""),
      Gen.oneOf("<", ">", ".", "..", "a.b", "x y", "", "\"v\"@en"))
    val sep = Gen.oneOf("", " ", "  ", "\t", " \t ")
    val lineGen = for {
      a <- sep; s <- token; b <- sep; p <- token; c <- sep
      o <- token; d <- sep; dot <- Gen.oneOf(".", "", ". .", "..")
      e <- sep
    } yield s"$a$s$b$p$c$o$d$dot$e"
    check("structured", Prop.forAll(lineGen)(agree _))
  }

  test("property: scanner == regex on arbitrary garbage") {
    val charGen = Gen.frequency(
      5 -> Gen.oneOf('<', '>', '.', ' ', '\t', '"'),
      3 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('\n', '\r', '\f', '\u000B', '\u00A0', '\u00E9'))
    val lineGen = Gen.listOf(charGen).map(_.mkString)
    check("garbage", Prop.forAll(lineGen)(agree _))
  }
}
