package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CharsetSniff

/** Charset resolution order + UTF-8 validator laws. */
class CharsetSniffSpec extends AnyFunSuite {

  private def enc(s: String, cs: String): Array[Byte] =
    s.getBytes(java.nio.charset.Charset.forName(cs))

  test("BOM wins over header and meta, and is stripped") {
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte)
    val (label, text) = CharsetSniff.sniffDecode(
      bom ++ enc("héllo", "UTF-8"), "text/html; charset=utf-16le")
    assert(label === "utf-8-bom" && text === "héllo")
    val le = Array[Byte](0xff.toByte, 0xfe.toByte) ++ enc("日本", "UTF-16LE")
    assert(CharsetSniff.sniffDecode(le, null) === ("utf-16le-bom", "日本"))
    val be = Array[Byte](0xfe.toByte, 0xff.toByte) ++ enc("日本", "UTF-16BE")
    assert(CharsetSniff.sniffDecode(be, null) === ("utf-16be-bom", "日本"))
  }

  test("header charset beats meta; quotes and case tolerated") {
    val body = enc("<meta charset=\"utf-8\"><p>café</p>", "windows-1252")
    val (label, text) = CharsetSniff.sniffDecode(body,
      "Text/HTML; Charset=\"Windows-1252\"")
    assert(label === "windows-1252" && text.contains("café"))
  }

  test("meta charset used when header has none (both syntaxes)") {
    val p1 = enc("<html><meta charset=iso-8859-1><p>ü</p>", "ISO-8859-1")
    assert(CharsetSniff.sniffDecode(p1, "text/html")._1 === "windows-1252")
    assert(CharsetSniff.sniffDecode(p1, "text/html")._2.contains("ü"))
    val p2 = enc("<meta http-equiv=\"Content-Type\" content=\"text/html; " +
      "charset=windows-1252\"><p>é</p>", "windows-1252")
    assert(CharsetSniff.sniffDecode(p2, null)._2.contains("é"))
  }

  test("the WHATWG quirk: iso-8859-1/ascii labels decode as windows-1252") {
    // 0x92 is a curly quote in cp1252 and a C1 control in true latin-1
    val body = "it".getBytes ++ Array(0x92.toByte) ++ "s".getBytes
    val (label, text) = CharsetSniff.sniffDecode(body,
      "text/plain; charset=ISO-8859-1")
    assert(label === "windows-1252" && text === "it’s")
  }

  test("no label: valid UTF-8 stays UTF-8, invalid falls to windows-1252") {
    assert(CharsetSniff.sniffDecode(enc("日本語 text", "UTF-8"), "text/html")
      === ("utf-8", "日本語 text"))
    val legacy = enc("café ü", "windows-1252")
    assert(CharsetSniff.sniffDecode(legacy, null) === ("windows-1252", "café ü"))
  }

  test("unknown labels fall through to validation") {
    assert(CharsetSniff.sniffDecode(enc("plain", "UTF-8"),
      "text/html; charset=x-noSuch-enc")._1 === "utf-8")
  }

  test("utf-8 validator: overlongs, stray continuations, surrogates, " +
      "truncation all rejected; boundary code points accepted") {
    import CharsetSniff.isValidUtf8
    assert(isValidUtf8("plain ascii".getBytes))
    assert(isValidUtf8(enc("ü€😀߿�", "UTF-8")))
    assert(!isValidUtf8(Array(0xc0.toByte, 0xaf.toByte)), "overlong /")
    assert(!isValidUtf8(Array(0xe0.toByte, 0x80.toByte, 0x80.toByte)), "overlong NUL")
    assert(!isValidUtf8(Array(0x80.toByte)), "stray continuation")
    assert(!isValidUtf8(Array(0xed.toByte, 0xa0.toByte, 0x80.toByte)), "surrogate")
    assert(!isValidUtf8(Array(0xf4.toByte, 0x90.toByte, 0x80.toByte, 0x80.toByte)),
      "past U+10FFFF")
    assert(!isValidUtf8(enc("é", "UTF-8").dropRight(1)), "truncated tail")
    assert(isValidUtf8(Array(0xf4.toByte, 0x8f.toByte, 0xbf.toByte, 0xbf.toByte)),
      "U+10FFFF exact")
  }

  test("decode replaces malformed sequences instead of failing") {
    val broken = "ok ".getBytes ++ Array(0xf0.toByte) ++ " tail".getBytes
    val (label, text) = CharsetSniff.sniffDecode(broken,
      "text/plain; charset=utf-8")
    assert(label === "utf-8" && text.contains("ok") && text.contains("tail"))
    assert(text.contains("�"))
  }
}
