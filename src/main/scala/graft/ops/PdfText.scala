package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Pure-JVM PDF text extraction — with [[Html]], the second big
  * "extract" stage of a document corpus (PDF is the dominant non-HTML
  * format in web crawls). The codec a bare JVM ships (DEFLATE, as
  * [[PngPixels]]) covers `/FlateDecode`, which is what real text
  * content streams use, so the whole chain — object scan, stream
  * inflate, content tokenizer, text-operator walk — runs in plain
  * Scala.
  *
  * Scope (documented subset, lenient like [[Html]] — an extractor must
  * produce SOMETHING for every payload, and [[Quality]] filters
  * downstream): objects located by a direct `N G obj` scan rather than
  * the xref table — robust to the mild xref corruption real crawls
  * carry, and unaffected by PDF 1.5+ COMPRESSED XREF/OBJECT streams:
  * the spec confines object streams to NON-stream objects, so content
  * streams stay top-level and their text extracts from 1.5+ files too
  * (only a hypothetical text operator inside an ObjStm-packed dict
  * could hide — there is none); `/FlateDecode` or
  * unfiltered streams; text via `BT…ET` blocks — `Tj`, `'`, `"`, `TJ`
  * (TJ kern numbers are NOT turned into spaces — concatenation only),
  * line breaks on `Td`/`TD`/`T*`/`Tm`; literal strings with nesting +
  * all escapes (incl. octal, line continuations), hex strings, and
  * UTF-16BE BOM strings; other bytes treated as Latin-1 (the WinAnsi
  * subset real fixtures use).
  *
  * Extraction contract (what the round-trip oracle proves): one output
  * line per text-positioning break, each line's ASCII whitespace runs
  * collapsed ([[Html]]'s RE2-`\s`-exact class), empty lines dropped,
  * lines joined with '\n', pages in object-number order.
  */
object PdfText {

  // ---------------------------------------------------------------- decode

  private def inflate(data: Array[Byte], cap: Int = 1 << 26): Option[Array[Byte]] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream(math.min(data.length * 4, 1 << 16))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsDictionary()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) return None // truncated
        if (out.size() + n > cap) return None
        out.write(buf, 0, n)
      }
      Some(out.toByteArray)
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** All decoded stream bodies in object-number order: scan for
    * `N G obj … stream\r?\n … endstream`, read the dict between `obj`
    * and `stream` textually for `/Filter /FlateDecode` (names only — a
    * filter array or any other filter skips the stream), and take the
    * bytes up to the matching `endstream` (the `/Length` value is NOT
    * trusted: crawl PDFs lie; the endstream scan is authoritative,
    * trailing EOL trimmed).
    */
  private[ops] def streams(pdf: Array[Byte]): Vector[Array[Byte]] = {
    val s = new String(pdf, StandardCharsets.ISO_8859_1)
    val objRx = java.util.regex.Pattern.compile(
      "(\\d+)\\s+\\d+\\s+obj\\b", java.util.regex.Pattern.DOTALL)
    val m = objRx.matcher(s)
    var found = Vector.empty[(Int, Array[Byte])]
    while (m.find()) {
      val objNum = m.group(1).toInt
      val objStart = m.end()
      val streamKw = s.indexOf("stream", objStart)
      val endobj = s.indexOf("endobj", objStart)
      if (streamKw >= 0 && (endobj < 0 || streamKw < endobj)) {
        val dict = s.substring(objStart, streamKw)
        // skip dicts whose "stream" hit is inside a name/string — cheap
        // guard: the keyword must be followed by an EOL
        var dataStart = streamKw + "stream".length
        if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
        val end = s.indexOf("endstream", dataStart)
        if (end >= 0) {
          val flate = dict.contains("/FlateDecode")
          val otherFilter = !flate && dict.contains("/Filter")
          if (!otherFilter) {
            val body =
              if (flate) {
                // the EOL before `endstream` is ambiguous: deflate data
                // can itself END in 0x0a/0x0d bytes, so blind trimming
                // truncates real data (found the hard way on the corpus
                // fixture) — try untrimmed first, then the trim variants
                Iterator(end, end - 1, end - 2)
                  .filter(_ >= dataStart)
                  .map(de => inflate(
                    java.util.Arrays.copyOfRange(pdf, dataStart, de)))
                  .collectFirst { case Some(b) => b }
              } else {
                var dataEnd = end
                if (dataEnd > dataStart && s.charAt(dataEnd - 1) == '\n')
                  dataEnd -= 1
                if (dataEnd > dataStart && s.charAt(dataEnd - 1) == '\r')
                  dataEnd -= 1
                Some(java.util.Arrays.copyOfRange(pdf, dataStart, dataEnd))
              }
            body.foreach(b => found = found :+ (objNum -> b))
          }
        }
      }
    }
    found.sortBy(_._1).map(_._2)
  }

  // ------------------------------------------------- content-stream walk

  /** Decode a PDF literal string body (between unescaped parens):
    * nesting already handled by the tokenizer; here the escapes.
    */
  private[ops] def literalString(raw: String): String = {
    val out = new StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c != '\\') { out.append(c); i += 1 }
      else if (i + 1 >= raw.length) i += 1
      else raw.charAt(i + 1) match {
        case 'n' => out.append('\n'); i += 2
        case 'r' => out.append('\r'); i += 2
        case 't' => out.append('\t'); i += 2
        case 'b' => out.append('\b'); i += 2
        case 'f' => out.append('\f'); i += 2
        case '(' => out.append('('); i += 2
        case ')' => out.append(')'); i += 2
        case '\\' => out.append('\\'); i += 2
        case '\r' => // line continuation
          i += 2; if (i < raw.length && raw.charAt(i) == '\n') i += 1
        case '\n' => i += 2
        case d if d >= '0' && d <= '7' =>
          var j = i + 1; var v = 0
          while (j < raw.length && j < i + 4 &&
            raw.charAt(j) >= '0' && raw.charAt(j) <= '7') {
            v = v * 8 + (raw.charAt(j) - '0'); j += 1
          }
          out.append((v & 0xff).toChar); i = j
        case other => out.append(other); i += 2
      }
    }
    // UTF-16BE BOM → decode as UTF-16 code units
    val sOut = out.toString
    if (sOut.length >= 2 && sOut.charAt(0) == 0xfe.toChar &&
        sOut.charAt(1) == 0xff.toChar) {
      val bytes = sOut.drop(2).map(c => (c.toInt & 0xff).toByte).toArray
      new String(bytes, StandardCharsets.UTF_16BE)
    } else sOut
  }

  private def hexString(raw: String): String = {
    val hex = raw.filter(c => Character.digit(c, 16) >= 0)
    val padded = if (hex.length % 2 == 1) hex + "0" else hex
    val bytes = padded.grouped(2)
      .map(h => Integer.parseInt(h, 16).toByte).toArray
    literalStringPostBom(new String(bytes, StandardCharsets.ISO_8859_1))
  }

  private def literalStringPostBom(s: String): String =
    if (s.length >= 2 && s.charAt(0) == 0xfe.toChar && s.charAt(1) == 0xff.toChar) {
      val bytes = s.drop(2).map(c => (c.toInt & 0xff).toByte).toArray
      new String(bytes, StandardCharsets.UTF_16BE)
    } else s

  private sealed trait CTok
  private final case class CStr(s: String) extends CTok
  private final case class COp(op: String) extends CTok

  /** Tokenize a content stream into strings and operators (numbers,
    * names, arrays, dicts are consumed but only string payloads and
    * operator keywords surface — all the text walk needs).
    */
  private def contentTokens(body: String): Iterator[CTok] = new Iterator[CTok] {
    private var i = 0
    private var pending: CTok = null
    private def computeNext(): CTok = {
      while (i < body.length) {
        val c = body.charAt(i)
        if (c.isWhitespace) i += 1
        else if (c == '%') { // comment to EOL
          while (i < body.length && body.charAt(i) != '\n' &&
            body.charAt(i) != '\r') i += 1
        } else if (c == '(') {
          var depth = 1; var j = i + 1
          val sb = new StringBuilder
          while (j < body.length && depth > 0) {
            val ch = body.charAt(j)
            if (ch == '\\' && j + 1 < body.length) {
              sb.append(ch).append(body.charAt(j + 1)); j += 2
            } else {
              if (ch == '(') depth += 1
              else if (ch == ')') depth -= 1
              if (depth > 0) sb.append(ch)
              j += 1
            }
          }
          i = j
          return CStr(literalString(sb.toString))
        } else if (c == '<' && i + 1 < body.length && body.charAt(i + 1) == '<') {
          i += 2 // dict open — contents handled token-by-token
        } else if (c == '>' && i + 1 < body.length && body.charAt(i + 1) == '>') {
          i += 2
        } else if (c == '<') {
          val e = body.indexOf('>', i + 1)
          if (e < 0) { i = body.length }
          else {
            val h = body.substring(i + 1, e)
            i = e + 1
            return CStr(hexString(h))
          }
        } else if (c == '[' || c == ']') i += 1
        else if (c == '/') { // name
          i += 1
          while (i < body.length && !body.charAt(i).isWhitespace &&
            !"()<>[]{}/%".contains(body.charAt(i))) i += 1
        } else if (c == '-' || c == '+' || c == '.' || c.isDigit) {
          i += 1
          while (i < body.length && (body.charAt(i).isDigit ||
            body.charAt(i) == '.')) i += 1
        } else {
          val start = i
          while (i < body.length && !body.charAt(i).isWhitespace &&
            !"()<>[]{}/%".contains(body.charAt(i))) i += 1
          if (i > start) return COp(body.substring(start, i))
        }
      }
      null
    }
    def hasNext: Boolean = {
      if (pending == null) pending = computeNext()
      pending != null
    }
    def next(): CTok = {
      if (!hasNext) throw new NoSuchElementException
      val t = pending; pending = null; t
    }
  }

  private def collapse(s: String): String =
    s.replaceAll("[ \t\n\r\f]+", " ").trim

  /** Extract the text of one decoded content stream per the contract. */
  private[ops] def textOfContent(body: String): Vector[String] = {
    val lines = Vector.newBuilder[String]
    val cur = new StringBuilder
    var strings = List.empty[String] // pending operands (reverse order)
    def break(): Unit = {
      val l = collapse(cur.toString)
      if (l.nonEmpty) lines += l
      cur.clear()
    }
    var inText = false
    contentTokens(body).foreach {
      case CStr(s) => strings = s :: strings
      case COp(op) =>
        op match {
          case "BT" => inText = true; strings = Nil
          case "ET" => inText = false; break(); strings = Nil
          case "Tj" | "TJ" if inText =>
            // TJ: every string operand in order (kern numbers were
            // consumed by the tokenizer; concatenation only)
            strings.reverse.foreach(cur.append)
            strings = Nil
          case "'" | "\"" if inText =>
            break()
            strings.reverse.foreach(cur.append)
            strings = Nil
          case "Td" | "TD" | "T*" | "Tm" if inText =>
            break(); strings = Nil
          case _ => strings = Nil
        }
    }
    break()
    lines.result()
  }

  /** Visible text of a PDF payload: all pages' lines joined with '\n';
    * empty string when nothing extractable (never null for non-null
    * input — profiling semantics).
    */
  def extractText(pdf: Array[Byte]): String = {
    if (pdf == null) return null
    if (pdf.length < 5 ||
        !new String(pdf, 0, math.min(pdf.length, 1024),
          StandardCharsets.ISO_8859_1).contains("%PDF-")) return ""
    streams(pdf).flatMap { b =>
      val body = new String(b, StandardCharsets.ISO_8859_1)
      if (body.contains("BT")) textOfContent(body) else Vector.empty
    }.mkString("\n")
  }

  // ---------------------------------------------------- fixture encoder

  /** Minimal classic PDF with one content stream per page (scaffolding
    * for specs + the oracle row): each page is a list of lines; every
    * line becomes `Td`-positioned shows. `flate` compresses the content
    * stream; lines at index ≡ 2 (mod 3) are emitted as a two-part TJ
    * with a kern number, others as Tj.
    */
  def pdfBytes(pages: Seq[Seq[String]], flate: Boolean): Array[Byte] = {
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    // non-Latin-1 text can't ride a literal string (the stream is
    // ISO-8859-1 bytes) — emit it as a BOM'd UTF-16BE hex string, the
    // spec's own mechanism for arbitrary code points
    def show(s: String): String =
      if (s.forall(_ <= 0xff.toChar)) s"(${esc(s)})"
      else "<FEFF" + s.getBytes(StandardCharsets.UTF_16BE)
        .map(b => f"${b & 0xff}%02X").mkString + ">"
    val out = new ByteArrayOutputStream()
    def w(s: String): Unit =
      out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def beginObj(n: Int): Unit = { offsets += out.size(); w(s"$n 0 obj\n") }
    w("%PDF-1.4\n")
    val nPages = pages.size
    val pageObj = (i: Int) => 3 + 2 * i       // page i
    val contentObj = (i: Int) => 4 + 2 * i    // its content stream
    val fontObj = 3 + 2 * nPages
    beginObj(1); w("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    w(s"<< /Type /Pages /Kids [${pages.indices
      .map(i => s"${pageObj(i)} 0 R").mkString(" ")}] /Count $nPages >>\nendobj\n")
    pages.zipWithIndex.foreach { case (lines, i) =>
      beginObj(pageObj(i))
      w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Contents ${contentObj(i)} 0 R " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> >>\nendobj\n")
      val content = new StringBuilder("BT /F1 12 Tf 72 720 Td\n")
      lines.zipWithIndex.foreach { case (line, j) =>
        if (j > 0) content.append("0 -14 Td\n")
        if (j % 3 == 2 && line.length > 3) {
          var cut = line.length / 2
          if (Character.isLowSurrogate(line.charAt(cut))) cut += 1
          content.append(s"[${show(line.take(cut))} -28 " +
            s"${show(line.drop(cut))}] TJ\n")
        } else content.append(s"${show(line)} Tj\n")
      }
      content.append("ET")
      val raw = content.toString.getBytes(StandardCharsets.ISO_8859_1)
      val body =
        if (flate) {
          val d = new Deflater()
          d.setInput(raw); d.finish()
          val b = new ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          while (!d.finished()) b.write(buf, 0, d.deflate(buf))
          d.end()
          b.toByteArray
        } else raw
      beginObj(contentObj(i))
      w(s"<< /Length ${body.length}" +
        (if (flate) " /Filter /FlateDecode" else "") + " >>\nstream\n")
      out.write(body)
      w("\nendstream\nendobj\n")
    }
    beginObj(fontObj)
    w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding /WinAnsiEncoding >>\nendobj\n")
    val xref = out.size()
    w(s"xref\n0 ${offsets.size + 1}\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${offsets.size + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xref\n%%EOF\n")
    out.toByteArray
  }

  // ---- Column surface ----

  private val textUdf = udf((b: Array[Byte]) => extractText(b))

  def pdfText(c: Column): Column = textUdf(c)
}
