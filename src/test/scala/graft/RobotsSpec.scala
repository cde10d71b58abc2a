package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Robots

/** RFC 9309 robots.txt laws: group selection, longest-match precedence,
  * wildcard/anchor matching, leniency on real-world mess.
  */
class RobotsSpec extends AnyFunSuite {

  private val body =
    """# global rules
      |User-agent: *
      |Disallow: /private
      |Allow: /private/open
      |Disallow: /tmp*.log$
      |
      |User-agent: graftbot
      |User-agent: graftbot-image
      |Crawl-delay: 2
      |Disallow: /doc/
      |""".stripMargin

  test("specific agent group beats *, and groups do NOT merge") {
    // graftbot gets ONLY its own group: /private is fair game
    assert(Robots.allowed(body, "graftbot", "/private/x"))
    assert(!Robots.allowed(body, "GraftBot", "/doc/1"), "agent match case-insensitive")
    assert(Robots.allowed(body, "graftbot-image", "/tmp1.log"),
      "second UA token shares the group")
    // unknown agent falls to *
    assert(!Robots.allowed(body, "otherbot", "/private/x"))
  }

  test("longest match wins; allow wins ties") {
    assert(!Robots.allowed(body, "otherbot", "/private/closed"))
    assert(Robots.allowed(body, "otherbot", "/private/open/f"),
      "/private/open (13) beats /private (8)")
    val tie = "User-agent: *\nDisallow: /a/b\nAllow: /a/c\n" +
      "Allow: /x/y\nDisallow: /x/z\n"
    assert(!Robots.allowed(tie, "b", "/a/b"))
    assert(Robots.allowed(tie, "b", "/x/y"))
    val equalLen = "User-agent: *\nDisallow: /p\nAllow: /p\n"
    assert(Robots.allowed(equalLen, "b", "/p/x"), "allow wins the exact tie")
  }

  test("wildcards and the $ anchor, including the backtracking case") {
    assert(!Robots.allowed(body, "otherbot", "/tmp123.log"))
    assert(Robots.allowed(body, "otherbot", "/tmp123.log.txt"), "$ anchors")
    val r = Robots.Rule(allow = false, "/a*b$")
    assert(r.matches("/axbyb"), "backtracking: * must reach the LAST b")
    assert(!r.matches("/axbyc"))
    assert(Robots.Rule(allow = false, "/a*").matches("/a"))
    assert(Robots.Rule(allow = false, "*.php$").matches("/x/y.php"))
  }

  test("no rules / no group / empty Disallow all mean allowed") {
    assert(Robots.allowed("", "bot", "/anything"))
    assert(Robots.allowed(null, "bot", "/anything"))
    assert(Robots.allowed("User-agent: other\nDisallow: /", "bot", "/x"))
    assert(Robots.allowed("User-agent: *\nDisallow:\n", "bot", "/x"),
      "empty Disallow allows everything")
    assert(!Robots.allowed("User-agent: *\nDisallow: /", "bot", "/x"),
      "bare / disallows everything")
  }

  test("lenient parsing: CRLF, comments, malformed lines, mixed case keys") {
    val messy = "user-AGENT: *\r\n# note\r\nDISALLOW: /a # trail\r\n" +
      "not a directive\r\nAllow /missing-colon\r\nallow: /a/ok\r\n"
    assert(!Robots.allowed(messy, "bot", "/a/x"))
    assert(Robots.allowed(messy, "bot", "/a/ok"))
    assert(Robots.allowed(messy, "bot", "/b"))
  }

  test("a new User-agent after rules starts a NEW group") {
    val b = "User-agent: a\nDisallow: /x\nUser-agent: b\nDisallow: /y\n"
    assert(!Robots.allowed(b, "a", "/x/1"))
    assert(Robots.allowed(b, "a", "/y/1"))
    assert(!Robots.allowed(b, "b", "/y/1"))
    assert(Robots.allowed(b, "b", "/x/1"))
  }
}
