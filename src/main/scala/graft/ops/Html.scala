package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** HTML text extraction — the step between a crawl response
  * ([[graft.sources.WarcReader]] bodies) and the `documents` table every
  * text pipeline starts from (the C4/CCNet "extract" stage). Pure
  * function over the markup, so it runs inside the row pipeline with no
  * shuffle: scan → extract → quality/langid/dedup downstream.
  *
  * Deliberately LENIENT where the media codecs are strict: a browser
  * renders broken markup, so an extractor that rejected it would drop
  * real text from the corpus — mis-nesting, unknown tags, bare `<`, and
  * unknown entities all pass through as text; the downstream quality
  * scores ([[Quality]]) are the filter for genuine garbage. The
  * contract is pinned by HtmlSpec instead of a spec-rejection rule.
  *
  * Extraction semantics (what the round-trip oracle proves):
  *  - `<script>`/`<style>` raw-text elements, comments, `<!...>`/`<?...>`
  *    declarations contribute nothing (a quoted `</p>` inside script
  *    text stays dead — the tokenizer honors raw-text content, and
  *    attribute values may contain `>` without ending the tag);
  *  - block-level tags split blocks, inline tags vanish (`a<b>b</b>` →
  *    "ab"), `td`/`th` separate cells with a space;
  *  - entities decode: the common named set + `&#NNN;` / `&#xHH;`
  *    numeric forms (astral code points included), unknown names kept
  *    verbatim;
  *  - each block's ASCII whitespace runs collapse to one space
  *    (`[ \t\n\r\f]` exactly — the RE2 `\s` class, so the DuckDB oracle
  *    spells it `\s+`; U+00A0 from `&nbsp;` is NOT collapsed), blocks
  *    are trimmed, empty blocks drop, blocks join with `\n`.
  */
object Html {

  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "li", "ul", "ol", "dl", "dt", "dd",
    "h1", "h2", "h3", "h4", "h5", "h6", "table", "thead", "tbody",
    "tfoot", "tr", "blockquote", "pre", "article", "section", "header",
    "footer", "nav", "aside", "main", "figure", "figcaption", "hr",
    "form", "fieldset", "address", "title", "head", "body", "html")

  private val CellTags: Set[String] = Set("td", "th")

  private val RawTextTags: Set[String] = Set("script", "style")

  private val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "mdash" -> "—",
    "ndash" -> "–", "hellip" -> "…", "copy" -> "©",
    "reg" -> "®", "trade" -> "™", "deg" -> "°",
    "plusmn" -> "±", "times" -> "×", "divide" -> "÷",
    "laquo" -> "«", "raquo" -> "»", "lsquo" -> "‘",
    "rsquo" -> "’", "ldquo" -> "“", "rdquo" -> "”",
    "bull" -> "•", "middot" -> "·", "sect" -> "§",
    "euro" -> "€", "pound" -> "£", "yen" -> "¥",
    "cent" -> "¢")

  /** Decode entities in a text run; malformed sequences stay verbatim. */
  private[ops] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        val decoded: Option[String] =
          if (semi < 0 || semi > i + 12) None
          else {
            val name = s.substring(i + 1, semi)
            if (name.startsWith("#x") || name.startsWith("#X"))
              try {
                val cp = Integer.parseInt(name.substring(2), 16)
                if (Character.isValidCodePoint(cp) && cp > 0)
                  Some(new String(Character.toChars(cp))) else None
              } catch { case _: NumberFormatException => None }
            else if (name.startsWith("#"))
              try {
                val cp = Integer.parseInt(name.substring(1))
                if (Character.isValidCodePoint(cp) && cp > 0)
                  Some(new String(Character.toChars(cp))) else None
              } catch { case _: NumberFormatException => None }
            else NamedEntities.get(name)
          }
        decoded match {
          case Some(d) => out.append(d); i = semi + 1
          case None => out.append(c); i += 1
        }
      }
    }
    out.toString
  }

  /** One tokenizer event. */
  private sealed trait Tok
  private final case class Text(s: String) extends Tok
  private final case class Tag(name: String, closing: Boolean,
      attrs: List[(String, String)]) extends Tok

  /** Index just past the closing '>' of a tag starting at `i` ('<'),
    * honoring quoted attribute values; -1 when unterminated.
    */
  private def tagEnd(s: String, i: Int): Int = {
    var j = i + 1
    var quote = 0.toChar
    while (j < s.length) {
      val c = s.charAt(j)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return j + 1
      j += 1
    }
    -1
  }

  /** Parse `<name attr=val ...>`; `end` is the index of the closing
    * '>' (exclusive bound for every scan).
    */
  private def parseTag(s: String, i: Int, end: Int): Tag = {
    var j = i + 1
    val closing = j < end && s.charAt(j) == '/'
    if (closing) j += 1
    val nameStart = j
    while (j < end && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '-')) j += 1
    val name = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
    var attrs = List.empty[(String, String)]
    while (j < end) {
      while (j < end && s.charAt(j).isWhitespace) j += 1
      val aStart = j
      while (j < end && !s.charAt(j).isWhitespace && s.charAt(j) != '=' &&
        s.charAt(j) != '/') j += 1
      if (j > aStart) {
        val aName = s.substring(aStart, j).toLowerCase(java.util.Locale.ROOT)
        while (j < end && s.charAt(j).isWhitespace) j += 1
        if (j < end && s.charAt(j) == '=') {
          j += 1
          while (j < end && s.charAt(j).isWhitespace) j += 1
          if (j < end && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
            val q = s.charAt(j)
            val vStart = j + 1
            var k = vStart
            while (k < end && s.charAt(k) != q) k += 1
            attrs = (aName -> s.substring(vStart, k)) :: attrs
            j = k + 1
          } else {
            val vStart = j
            while (j < end && !s.charAt(j).isWhitespace) j += 1
            attrs = (aName -> s.substring(vStart, j)) :: attrs
          }
        } else attrs = (aName -> "") :: attrs
      } else j += 1
    }
    Tag(name, closing, attrs.reverse)
  }

  /** Tokenize markup into text runs and tags, with comment /
    * declaration / raw-text handling. Lenient: unterminated constructs
    * run to end-of-input as dead markup, a bare `<` is literal text.
    */
  private def tokens(html: String): Iterator[Tok] = new Iterator[Tok] {
    private var i = 0
    private var pending: Tok = null
    private def computeNext(): Tok = {
      while (i < html.length) {
        val lt = html.indexOf('<', i)
        if (lt < 0) { val t = Text(html.substring(i)); i = html.length; return t }
        if (lt > i) { val t = Text(html.substring(i, lt)); i = lt; return t }
        // i == lt: dispatch on what follows '<'
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) html.length else e + 3
        } else if (i + 1 < html.length &&
            (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val e = html.indexOf('>', i + 1)
          i = if (e < 0) html.length else e + 1
        } else if (i + 1 < html.length &&
            (html.charAt(i + 1).isLetter || html.charAt(i + 1) == '/')) {
          val e = tagEnd(html, i)
          if (e < 0) { i = html.length }
          else {
            val tag = parseTag(html, i, e - 1)
            i = e
            if (!tag.closing && RawTextTags(tag.name)) {
              // raw text: skip to the matching close tag (case-insensitive
              // regionMatches scan — no lowercase copy of the document),
              // content is dead
              val needle = "</" + tag.name
              var close = -1
              var k = i
              while (close < 0 && k <= html.length - needle.length) {
                if (html.charAt(k) == '<' &&
                    html.regionMatches(true, k, needle, 0, needle.length))
                  close = k
                k += 1
              }
              if (close < 0) i = html.length
              else {
                val ce = html.indexOf('>', close)
                i = if (ce < 0) html.length else ce + 1
              }
            }
            return tag
          }
        } else { val t = Text("<"); i += 1; return t }
      }
      null
    }
    def hasNext: Boolean = {
      if (pending == null) pending = computeNext()
      pending != null
    }
    def next(): Tok = {
      if (!hasNext) throw new NoSuchElementException
      val t = pending; pending = null; t
    }
  }

  private def collapse(s: String): String =
    s.replaceAll("[ \t\n\r\f]+", " ").trim

  /** Visible text: blocks joined with '\n' per the contract above. */
  def extractText(html: String): String = {
    if (html == null) return null
    val blocks = Vector.newBuilder[String]
    val cur = new StringBuilder
    def flush(): Unit = {
      val b = collapse(decodeEntities(cur.toString))
      if (b.nonEmpty) blocks += b
      cur.clear()
    }
    tokens(html).foreach {
      case Text(s) => cur.append(s)
      case Tag(name, _, _) if BlockTags(name) => flush()
      case Tag(name, _, _) if CellTags(name) => cur.append(' ')
      case _ => // inline tag: vanishes
    }
    flush()
    blocks.result().mkString("\n")
  }

  /** Structural containers whose content is navigation chrome, not
    * document content — [[extractMainText]] drops everything inside.
    */
  private val ChromeTags: Set[String] = Set("nav", "footer", "header", "aside")

  /** MAIN-content extraction (the trafilatura/jusText-style step beyond
    * tag stripping — boilerplate chrome hurts training corpora more
    * than tags do). Same block walk as [[extractText]], with three
    * drops, each deterministic so the oracle can reproduce the result:
    *   - `<head>` content never contributes (the title is metadata, not
    *     body text — [[extractTitle]] carries it);
    *   - blocks whose raw characters are majority inside
    *     `nav`/`footer`/`header`/`aside` drop (structural chrome);
    *   - blocks whose raw characters are majority inside `<a>` drop
    *     (link lists, read-more rows, menus — the link-density rule).
    */
  def extractMainText(html: String): String = {
    if (html == null) return null
    val blocks = Vector.newBuilder[String]
    val cur = new StringBuilder
    var rawChars = 0L
    var anchorChars = 0L
    var chromeChars = 0L
    var headDepth = 0
    var anchorDepth = 0
    var chromeDepth = 0
    def flush(): Unit = {
      val b = collapse(decodeEntities(cur.toString))
      if (b.nonEmpty && chromeChars * 2 <= rawChars &&
          anchorChars * 2 <= rawChars) blocks += b
      cur.clear(); rawChars = 0; anchorChars = 0; chromeChars = 0
    }
    tokens(html).foreach {
      case Text(s) =>
        if (headDepth == 0) {
          cur.append(s)
          rawChars += s.length
          if (anchorDepth > 0) anchorChars += s.length
          if (chromeDepth > 0) chromeChars += s.length
        }
      case Tag("head", closing, _) =>
        headDepth = math.max(0, headDepth + (if (closing) -1 else 1))
        flush()
      case Tag("a", closing, _) =>
        anchorDepth = math.max(0, anchorDepth + (if (closing) -1 else 1))
      case Tag(name, closing, _) if ChromeTags(name) =>
        chromeDepth = math.max(0, chromeDepth + (if (closing) -1 else 1))
        flush()
      case Tag(name, _, _) if BlockTags(name) => flush()
      case Tag(name, _, _) if CellTags(name) =>
        if (headDepth == 0) { cur.append(' '); rawChars += 1 }
      case _ =>
    }
    flush()
    blocks.result().mkString("\n")
  }

  /** `<title>` content (collapsed, entity-decoded), or null. */
  def extractTitle(html: String): String = {
    if (html == null) return null
    val it = tokens(html)
    var inTitle = false
    val sb = new StringBuilder
    while (it.hasNext) {
      it.next() match {
        case Tag("title", closing, _) =>
          if (closing && inTitle) return collapse(decodeEntities(sb.toString))
          inTitle = !closing
        case Text(s) if inTitle => sb.append(s)
        case _ =>
      }
    }
    if (inTitle) collapse(decodeEntities(sb.toString)) else null
  }

  /** `href` values of `<a>` tags in document order (entity-decoded,
    * trimmed, empties dropped) — the crawl-frontier / link-graph edges
    * that feed [[Urls]] normalization and the [[Graph]] ops.
    */
  def extractLinks(html: String): Seq[String] = {
    if (html == null) return Seq.empty
    tokens(html).collect {
      case Tag("a", false, attrs) =>
        attrs.collectFirst { case ("href", v) => decodeEntities(v).trim }
    }.flatten.filter(_.nonEmpty).toSeq
  }

  /** Escape a text run for embedding in markup (fixture scaffolding —
    * the inverse the round-trip oracle runs through).
    */
  def escapeText(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  // ---- Column surface ----

  private val textUdf = udf((s: String) => extractText(s))
  private val mainTextUdf = udf((s: String) => extractMainText(s))
  private val titleUdf = udf((s: String) => extractTitle(s))
  private val linksUdf = udf((s: String) => extractLinks(s))

  def htmlText(c: Column): Column = textUdf(c)
  def htmlMainText(c: Column): Column = mainTextUdf(c)
  def htmlTitle(c: Column): Column = titleUdf(c)
  def htmlLinks(c: Column): Column = linksUdf(c)
}
