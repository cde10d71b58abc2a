package graft.ops

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Charset detection + decoding for crawl payloads — the step between
  * [[graft.sources.WarcReader]]'s raw HTTP bodies and every text
  * operator: real crawls are a mix of UTF-8, legacy 8-bit pages, and
  * BOM'd UTF-16, and decoding them all as UTF-8 silently corrupts the
  * non-UTF-8 tail of the corpus (mojibake that later poisons dedup and
  * quality scoring).
  *
  * Resolution order (the WHATWG encoding-sniff algorithm's practical
  * core, deterministic so the oracle can replay it):
  *   1. BOM: UTF-8 / UTF-16LE / UTF-16BE (BOM always wins and is
  *      stripped);
  *   2. `charset=` in the HTTP `Content-Type` header;
  *   3. `charset=` in an HTML `<meta>` within the first 1024 bytes
  *      (both the HTML5 `<meta charset=…>` and the legacy http-equiv
  *      form — found textually, tolerant of quotes/case);
  *   4. strict UTF-8 validation of the whole payload: valid → UTF-8;
  *   5. fallback windows-1252 (the browser default that decodes every
  *      byte, so step 5 never fails).
  * Unknown/unsupported charset labels fall through to step 4. The
  * decode itself REPLACES malformed sequences (U+FFFD) rather than
  * failing — profiling semantics: every payload yields text.
  */
object CharsetSniff {

  /** (charset label actually used, decoded text). */
  def sniffDecode(payload: Array[Byte], contentType: String): (String, String) = {
    if (payload == null) return ("none", null)
    // 1. BOM
    if (payload.length >= 3 && (payload(0) & 0xff) == 0xef &&
        (payload(1) & 0xff) == 0xbb && (payload(2) & 0xff) == 0xbf)
      return ("utf-8-bom", decodeWith(payload, 3, StandardCharsets.UTF_8))
    if (payload.length >= 2 && (payload(0) & 0xff) == 0xff &&
        (payload(1) & 0xff) == 0xfe)
      return ("utf-16le-bom", decodeWith(payload, 2, StandardCharsets.UTF_16LE))
    if (payload.length >= 2 && (payload(0) & 0xff) == 0xfe &&
        (payload(1) & 0xff) == 0xff)
      return ("utf-16be-bom", decodeWith(payload, 2, StandardCharsets.UTF_16BE))
    // 2. header charset
    val fromHeader = Option(contentType).flatMap(charsetParam)
    // 3. meta charset in the first 1024 bytes
    val fromMeta = if (fromHeader.isDefined) None else metaCharset(payload)
    (fromHeader orElse fromMeta).flatMap(lookup) match {
      case Some((label, cs)) => (label, decodeWith(payload, 0, cs))
      case None =>
        // 4/5. UTF-8 validity, else windows-1252
        if (isValidUtf8(payload))
          ("utf-8", decodeWith(payload, 0, StandardCharsets.UTF_8))
        else ("windows-1252", decodeWith(payload, 0,
          Charset.forName("windows-1252")))
    }
  }

  /** `charset=` parameter of a Content-Type-ish string, lowercased. */
  private[ops] def charsetParam(ct: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile("charset\\s*=\\s*\"?([A-Za-z0-9_.:-]+)\"?",
        java.util.regex.Pattern.CASE_INSENSITIVE)
      .matcher(ct)
    if (m.find()) Some(m.group(1).toLowerCase(java.util.Locale.ROOT)) else None
  }

  /** charset from a `<meta>` in the first 1024 bytes (ASCII-compatible
    * superset scan — the labels themselves are ASCII in every encoding
    * this step can name).
    */
  private[ops] def metaCharset(payload: Array[Byte]): Option[String] = {
    val head = new String(payload, 0, math.min(payload.length, 1024),
      StandardCharsets.ISO_8859_1).toLowerCase(java.util.Locale.ROOT)
    val meta = java.util.regex.Pattern
      .compile("<meta[^>]*charset\\s*=\\s*['\"]?\\s*([a-z0-9_.:-]+)")
      .matcher(head)
    if (meta.find()) Some(meta.group(1)) else None
  }

  /** Resolve a label to a JVM charset; common aliases normalized; the
    * WHATWG quirk is honored: pages LABELED iso-8859-1/ascii are decoded
    * as windows-1252 (browsers do, and the corpus was authored for
    * browsers). Unknown labels → None (fall through to validation).
    */
  private[ops] def lookup(label: String): Option[(String, Charset)] = {
    val canon = label match {
      case "iso-8859-1" | "latin1" | "latin-1" | "us-ascii" | "ascii" |
           "windows-1252" | "cp1252" => "windows-1252"
      case "utf8" | "utf-8" => "utf-8"
      case "utf-16" | "utf16" => "utf-16"
      case other => other
    }
    try Some((canon, Charset.forName(canon)))
    catch {
      case _: java.nio.charset.IllegalCharsetNameException => None
      case _: java.nio.charset.UnsupportedCharsetException => None
    }
  }

  private def decodeWith(p: Array[Byte], from: Int, cs: Charset): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(p, from, p.length - from)).toString
  }

  /** Strict UTF-8 validation (table-free state walk — no decoder
    * allocation on the hot path; overlongs, surrogates, and >U+10FFFF
    * all rejected).
    */
  def isValidUtf8(p: Array[Byte]): Boolean = {
    var i = 0
    while (i < p.length) {
      val b = p(i) & 0xff
      if (b < 0x80) i += 1
      else {
        val (len, min) =
          if ((b & 0xe0) == 0xc0) (2, 0x80)
          else if ((b & 0xf0) == 0xe0) (3, 0x800)
          else if ((b & 0xf8) == 0xf0) (4, 0x10000)
          else return false
        if (i + len > p.length) return false
        var cp = b & (0x7f >> len)
        var j = i + 1
        while (j < i + len) {
          if ((p(j) & 0xc0) != 0x80) return false
          cp = (cp << 6) | (p(j) & 0x3f)
          j += 1
        }
        if (cp < min || cp > 0x10ffff ||
            (cp >= 0xd800 && cp <= 0xdfff)) return false
        i += len
      }
    }
    true
  }

  // ---- Column surface ----

  /** Typed UDF result (schema inferred — no untyped-UDF legacy path). */
  final case class Sniffed(charset: String, text: String)

  private val sniffUdf = udf((p: Array[Byte], ct: String) => {
    val (label, text) = sniffDecode(p, ct)
    Sniffed(label, text)
  })

  /** struct(charset, text) for a (payload, contentType) pair. */
  def sniffDecoded(payload: Column, contentType: Column): Column =
    sniffUdf(payload, contentType)
}
