package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Boilerplate-strip main-content heuristics (graft.kernel.Boilerplate) —
  * each rule individually, the composed q42 page shape, and the guardrails
  * (whole-token matching, density threshold, content preservation).
  */
class BoilerplateSpec extends AnyFunSuite {

  private def mc(html: String, maxLinkDensity: Double = 0.5) =
    Boilerplate.mainContent(html, maxLinkDensity)

  test("tag strip: script/style/nav/footer/aside subtrees removed") {
    val r = mc("<body><script>var a = 1 < 2;</script><style>.x{}</style>" +
      "<nav><a href=\"/\">Home</a></nav><aside>related stuff</aside>" +
      "<p>keep me</p><footer>bye</footer></body>")
    assert(r.main_text == "keep me")
    assert(r.n_stripped == 5)
  }

  test("class-token strip: whole-token match only") {
    val r = mc("<div class=\"sidebar\">chrome</div>" +
      "<div class=\"considerable\">content stays</div>")
    assert(r.main_text == "content stays")
    assert(r.n_stripped == 1)
  }

  test("id-token strip: dash/underscore-split segments match") {
    val r = mc("<div id=\"page-header\">site chrome</div>" +
      "<div id=\"main_body\">real text</div>")
    assert(r.main_text == "real text")
    assert(r.n_stripped == 1)
  }

  test("link-density prune: a link farm div is dropped, prose with a link is kept") {
    val farm = "<div><a href=\"#\">x1</a> <a href=\"#\">x2</a> <a href=\"#\">x3</a></div>"
    val prose = "<div>a long paragraph of genuine prose text with one " +
      "<a href=\"#\">link</a> inside it</div>"
    val r = mc(farm + prose)
    assert(r.main_text.startsWith("a long paragraph"))
    assert(r.n_stripped == 1)
  }

  test("link-density prune is top-down: the over-dense container goes whole") {
    // outer div is all anchor text spread across two inner uls
    val r = mc("<div><ul><li><a>a</a></li></ul><ul><li><a>b</a></li></ul></div>" +
      "<p>body</p>")
    assert(r.main_text == "body")
    assert(r.n_stripped == 1) // the outer div, counted once
  }

  test("density threshold is respected") {
    // 4 anchor chars of 12 total = 1/3 density: kept at 0.5, dropped at 0.3
    val html = "<div>eight ch <a href=\"#\">four</a></div><p>tail</p>"
    assert(mc(html, 0.5).main_text == "eight ch four\ntail")
    assert(mc(html, 0.3).main_text == "tail")
  }

  test("whitespace between links does not dilute link density") {
    val r = mc("<div>\n  <a>m1</a>\n  <a>m2</a>\n  <a>m3</a>\n</div><p>t</p>")
    assert(r.main_text == "t")
  }

  test("empty-text containers survive the density rule (0/0 is not dense)") {
    val r = mc("<div><img src=\"x.png\" /></div><p>t</p>")
    assert(r.main_text == "t")
    assert(r.n_stripped == 0)
  }

  test("the composed q42 page shape strips exactly 7 subtrees") {
    val page = "<html><head><script>var x = 1 < 2;</script>" +
      "<style>.m{color:red}</style></head><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
      "<div class=\"sidebar widget\"><p>subscribe now</p></div>" +
      "<div id=\"page-header\"><span>site</span></div>" +
      "<div class=\"content\"><p>the real article text</p></div>" +
      "<div><a href=\"#\">m1</a> <a href=\"#\">m2</a> <a href=\"#\">m3</a></div>" +
      "<footer>(c) example</footer></body></html>"
    val r = mc(page)
    assert(r.main_text == "the real article text")
    assert(r.n_stripped == 7)
  }

  test("strip is idempotent") {
    val root = HtmlParser.parse("<nav>x</nav><div class=\"ad\">y</div><p>z</p>")
    assert(Boilerplate.strip(root) == 2)
    assert(Boilerplate.strip(root) == 0)
    assert(root.structuredText == "z")
  }

  test("stats: anchor chars counted through nested elements") {
    val root = HtmlParser.parse("<div><a><span>four</span></a> and text</div>")
    val d = root.firstChild.asInstanceOf[Element]
    val (total, anchor) = Boilerplate.textStats(d)
    assert(anchor == 4)
    assert(total == "four".length + " and text".length)
  }

  test("strip is O(doc) on pathological 50k-deep nesting") {
    // the per-container textStats walk was O(depth^2) here (~90 s at 100k
    // deep); the bottom-up precomputation must keep this in kernel-pass
    // territory, and the density decision must be unchanged (prose-only
    // subtree -> nothing stripped)
    val depth = 50000
    val html = "<div>" * depth + "content text here" + "</div>" * depth
    val root = HtmlParser.parse(html)
    val t0 = System.nanoTime()
    val removed = Boilerplate.strip(root)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(removed == 0)
    assert(root.structuredText == "content text here")
    assert(sec < 20.0, s"deep strip took $sec s — quadratic regression?")
  }
}
