package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** robots.txt parsing + RFC 9309 evaluation semantics. */
class RobotsSpec extends AnyFunSuite {

  test("basic disallow with * fallback group") {
    val p = Robots.parse("User-agent: *\nDisallow: /private\n")
    assert(!p.isAllowed("anybot", "/private/x"))
    assert(!p.isAllowed("anybot", "/private"))
    assert(p.isAllowed("anybot", "/public"))
  }

  test("most-specific rule wins; ties go to Allow") {
    val p = Robots.parse(
      "User-agent: *\nDisallow: /a\nAllow: /a/pub\n")
    assert(!p.isAllowed("b", "/a/x"))
    assert(p.isAllowed("b", "/a/pub/doc")) // longer Allow beats shorter Disallow
    val tie = Robots.parse("User-agent: *\nDisallow: /dir\nAllow: /dir\n")
    assert(tie.isAllowed("b", "/dir/x")) // equal length -> Allow
  }

  test("wildcard * and $ anchor") {
    val p = Robots.parse(
      "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*/x\n")
    assert(!p.isAllowed("b", "/doc/file.pdf"))
    assert(p.isAllowed("b", "/doc/file.pdfx")) // $ anchored
    assert(!p.isAllowed("b", "/tmp123/x"))
    assert(p.isAllowed("b", "/tmp123/y"))
  }

  test("agent groups: longest substring match, shared rule blocks") {
    val p = Robots.parse(
      "User-agent: alpha\nUser-agent: beta\nDisallow: /ab\n\n" +
        "User-agent: alphabot-pro\nDisallow: /pro\n\n" +
        "User-agent: *\nDisallow: /all\n")
    assert(!p.isAllowed("AlphaBot-Pro/1.0", "/pro/x")) // longest agent token
    assert(p.isAllowed("alphabot-pro", "/ab")) // its group has no /ab rule
    assert(!p.isAllowed("beta-crawler", "/ab/x")) // shared block
    assert(!p.isAllowed("unknown", "/all/x")) // * fallback
    assert(p.isAllowed("unknown", "/ab")) // * group lacks /ab
  }

  test("empty Disallow allows everything; comments stripped; unknown keys ignored") {
    val p = Robots.parse(
      "# top comment\nUser-agent: * # trailing\nDisallow:\nFancy-directive: x\n")
    assert(p.isAllowed("b", "/anything"))
  }

  test("crawl-delay and sitemaps surfaced") {
    val p = Robots.parse(
      "User-agent: slowbot\nCrawl-delay: 2.5\nDisallow: /x\n" +
        "Sitemap: https://h/s1.xml\nSitemap: https://h/s2.xml\n")
    assert(p.crawlDelay("slowbot") == 2.5)
    assert(p.sitemaps == Seq("https://h/s1.xml", "https://h/s2.xml"))
  }

  test("no matching group and no * means everything allowed") {
    val p = Robots.parse("User-agent: otherbot\nDisallow: /\n")
    assert(p.isAllowed("mybot", "/anything"))
    assert(!p.isAllowed("otherbot-2", "/anything")) // substring matches otherbot
  }

  test("delayFor: agent-specific beats *, absent means no constraint") {
    val p = Robots.parse(
      "User-agent: graftbot\nCrawl-delay: 2.5\n\nUser-agent: *\nCrawl-delay: 9")
    assert(p.delayFor("GraftBot/1.0") == 2.5)
    assert(p.delayFor("otherbot") == 9.0)
    assert(Robots.parse("User-agent: *\nDisallow: /x").delayFor("graftbot") == 0.0)
    // GROUP-consistent with rulesFor: a named group that declares NO delay
    // shields its agent from the * group's delay (the site addressed the
    // agent specifically and imposed none)
    val q = Robots.parse(
      "User-agent: graftbot\nAllow: /\n\nUser-agent: *\nCrawl-delay: 10")
    assert(q.delayFor("graftbot") == 0.0)
    assert(q.delayFor("otherbot") == 10.0)
  }
}
