package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Html

/** The HTML extraction contract: tokenizer leniency, raw-text/comment
  * deadness, block structure, entities, links, title — pinned here
  * because the extractor is deliberately lenient (no reject path), so
  * the spec IS the contract.
  */
class HtmlSpec extends AnyFunSuite {

  test("block structure: blocks split on block tags, inline tags vanish") {
    assert(Html.extractText(
      "<html><body><h1>Title</h1><p>a<b>b</b>c <i>d</i></p><p>e</p></body></html>")
      === "Title\nabc d\ne")
  }

  test("script/style/comments/declarations contribute nothing — even with " +
      "markup-shaped content inside") {
    val html = """<!DOCTYPE html><html><head>
      |<style>p { content: "</p> not text"; }</style>
      |<script type="text/js">var s = "<p>fake</p>"; if (a<b && c>d) {}</script>
      |</head><body><!-- <p>hidden</p> --><p>real</p></body></html>""".stripMargin
    assert(Html.extractText(html) === "real")
  }

  test("raw-text close tag is case-insensitive") {
    assert(Html.extractText("<p>a</p><SCRIPT>x<p>no</p></ScRiPt><p>b</p>")
      === "a\nb")
  }

  test("attributes may contain '>' inside quotes without ending the tag") {
    assert(Html.extractText("""<p data-x="a>b" title='c>d'>ok</p>""") === "ok")
  }

  test("entities: named, decimal, hex, astral; unknown stays verbatim") {
    assert(Html.extractText("<p>&lt;a&gt; &amp; &quot;q&quot; &#65;&#x42; " +
      "&#x1F600; &unknown; &copy;</p>")
      === "<a> & \"q\" AB 😀 &unknown; ©")
  }

  test("&nbsp; decodes to U+00A0 and does NOT collapse") {
    assert(Html.extractText("<p>a&nbsp;&nbsp;b   c</p>") === "a  b c")
  }

  test("whitespace collapses per block; empty blocks drop") {
    assert(Html.extractText(
      "<p>  a\n\t b </p><p>   </p><div></div><p>c</p>") === "a b\nc")
  }

  test("table cells separate with a space; rows are blocks") {
    assert(Html.extractText(
      "<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>")
      === "a b\nc")
  }

  test("lenient: bare '<', mis-nesting, unknown tags, unterminated tag") {
    assert(Html.extractText("<p>1 < 2 and 3 > 2</p>") === "1 < 2 and 3 > 2")
    assert(Html.extractText("<p><b>bold<i>both</b>it</i></p>") === "boldbothit")
    assert(Html.extractText("<p><custom-el x>t</custom-el></p>") === "t")
    assert(Html.extractText("<p>a<q attr=") === "a")
    assert(Html.extractText("") === "")
    assert(Html.extractText(null) === null)
  }

  test("escapeText round-trips through extraction") {
    val nasty = "a & b < c > d && <p>not a tag</p> &amp; done"
    assert(Html.extractText(s"<p>${Html.escapeText(nasty)}</p>") === nasty)
  }

  test("title: entity-decoded, collapsed; unterminated tolerated") {
    assert(Html.extractTitle(
      "<html><head><title> A &amp;  B </title></head><body>x</body></html>")
      === "A & B")
    assert(Html.extractTitle("<p>no title</p>") === null)
    assert(Html.extractTitle("<title>open") === "open")
  }

  test("links: hrefs in document order, decoded + trimmed, empties dropped") {
    val html = """<body><a href="/a?x=1&amp;y=2">one</a>
      |<a class="z" href=' /b '>two</a><a name="anchor">none</a>
      |<a href="">empty</a><A HREF="/caps">three</A></body>""".stripMargin
    assert(Html.extractLinks(html) === Seq("/a?x=1&y=2", "/b", "/caps"))
    assert(Html.extractLinks(null) === Seq.empty)
  }

  test("main-content: chrome containers, link-dense blocks, and head drop; " +
      "content blocks survive") {
    val page = """<html><head><title>T</title></head><body>
      |<nav><a href="/">Home</a> | <a href="/x">About</a></nav>
      |<header><p>banner text</p></header>
      |<h1>Heading</h1>
      |<p>real content paragraph</p>
      |<p><a href="/more">continue reading</a></p>
      |<aside>Related: <a href="/r1">one</a> <a href="/r2">two</a></aside>
      |<p>closing remarks stay</p>
      |<footer>© corp</footer>
      |</body></html>""".stripMargin
    assert(Html.extractMainText(page) ===
      "Heading\nreal content paragraph\nclosing remarks stay")
    // extractText keeps everything by contrast
    assert(Html.extractText(page).contains("Home"))
    assert(Html.extractText(page).contains("T"))
  }

  test("main-content link-density boundary: exactly half link chars keeps") {
    // raw 8 chars, 4 inside the anchor: 4*2 <= 8 → kept
    assert(Html.extractMainText("<body><p>abcd<a href='/'>wxyz</a></p></body>")
      === "abcdwxyz")
    // 5 of 9 inside the anchor → dropped
    assert(Html.extractMainText("<body><p>abcd<a href='/'>vwxyz</a></p></body>")
      === "")
    assert(Html.extractMainText(null) === null)
  }

  test("extraction is total on hostile input (fuzz: never throws)") {
    val base = "<html><head><title>t</title><script>s</script></head>" +
      "<body><p>a &amp; b</p><a href=\"/x\">l</a><!-- c --></body></html>"
    val rnd = new scala.util.Random(7)
    (0 until 400).foreach { _ =>
      val chars = base.toCharArray
      (0 until 1 + rnd.nextInt(5)).foreach { _ =>
        chars(rnd.nextInt(chars.length)) =
          "<>&;\"'/= abc!#x".charAt(rnd.nextInt(15))
      }
      val m = new String(chars)
      Html.extractText(m); Html.extractMainText(m)
      Html.extractTitle(m); Html.extractLinks(m)
    }
  }
}
