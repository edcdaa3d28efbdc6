package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Re-encoding of TextNode/HTMLElement behavior suites
  * (/root/reference/test/html.test.ts:438–668) + entity codec unit tests.
  */
class ExtractSpec extends AnyFunSuite {

  private def parse(s: String, o: ParseOptions = ParseOptions()) = HtmlParser.parse(s, o)
  private def firstEl(root: Element): Element = root.firstChild.asInstanceOf[Element]

  // html.test.ts:438–449
  test("isWhitespace detects whitespace incl. &nbsp;") {
    assert(new TextNode("").isWhitespace)
    assert(new TextNode(" \t").isWhitespace)
    assert(new TextNode(" \t&nbsp; \t").isWhitespace)
    assert(!new TextNode(" x ").isWhitespace)
  }

  // html.test.ts:453–464
  test("prependChild adds children in order") {
    val root = parse("<p></p>")
    val p = firstEl(root)
    p.prependChild(new TextNode("3"))
    p.prependChild(new TextNode("2"))
    p.prependChild(new TextNode("1"))
    assert(root.firstChild.text == "123")
  }

  // html.test.ts:466–473
  test("remove() detaches the node") {
    val root = parse("<div><p></p></div>")
    val child = firstEl(root)
    child.firstChild.remove()
    assert(child.outerHTML == "<div></div>")
  }

  // html.test.ts:475–487
  test("removeWhitespace preserves content nodes") {
    val root = parse("<div> \r \n  \t <h5> 123 </h5></div>")
    val child = firstEl(root)
    child.removeWhitespace()
    assert(child.toHtml == "<div><h5>123</h5></div>")
  }

  // html.test.ts:614–618
  test("structuredText flushes blocks with newlines") {
    val root = parse("<span>o<p>a</p><p>b</p>c</span>")
    assert(root.structuredText == "o\na\nb\nc")
  }

  // html.test.ts:620–623
  test("structuredText ignores comments") {
    val root = parse("<span>o<p>a</p><!-- my comment --></span>", ParseOptions(comment = true))
    assert(root.structuredText == "o\na")
  }

  // html.test.ts:625–646
  test("set_content variants") {
    locally {
      val root = parse("<div></div>")
      root.children(0).setContent("<span><div>abc</div>bla</span>")
      assert(root.toHtml == "<div><span><div>abc</div>bla</span></div>")
    }
    locally {
      val root = parse("<div></div>")
      root.children(0).setContent(parse("<span><div>abc</div>bla</span>").childNodes.toSeq)
      assert(root.toHtml == "<div><span><div>abc</div>bla</span></div>")
    }
    locally {
      val root = parse("<div></div>")
      root.children(0).setContent(parse("<span><div>abc</div>bla</span>").childNodes(0))
      assert(root.toHtml == "<div><span><div>abc</div>bla</span></div>")
    }
    locally {
      val root = parse("<div></div>")
      root.children(0).setContent("abc")
      assert(root.toHtml == "<div>abc</div>")
    }
  }

  // html.test.ts:647–668
  test("innerHTML setter") {
    val root = parse("<div></div>")
    root.children(0).innerHTML = "<span><div>abc</div>bla</span>"
    assert(root.toHtml == "<div><span><div>abc</div>bla</span></div>")
    val root2 = parse("<div></div>")
    root2.children(0).innerHTML = "abc"
    assert(root2.toHtml == "<div>abc</div>")
  }

  test("innerHTML setter leaves old text children in place (quirk)") {
    // remove() no-ops for text nodes because their parentNode is never set
    val root = parse("<div>old</div>")
    root.children(0).innerHTML = "<b>new</b>"
    assert(root.toHtml == "<div>old<b>new</b></div>")
  }

  test("structuredText whitespace-node becomes pending single space") {
    val root = parse("<span>a </span> <span>b</span>")
    assert(root.structuredText == "a b")
  }

  test("structuredText collapses internal whitespace runs") {
    val root = parse("<p>a   b\n\t c</p>")
    assert(root.structuredText == "a b c")
  }

  test("structuredText: br is a block boundary; ul/table are not") {
    assert(parse("x<br>y").structuredText == "x\ny")
    assert(parse("<ul><li>a</li><li>b</li></ul>").structuredText == "a\nb")
    assert(parse("<table><tr><td>a</td><td>b</td></tr></table>").structuredText == "a\nb")
  }

  test("rawText includes comment values (quirk)") {
    val root = parse("<div>a<!--c-->b</div>", ParseOptions(comment = true))
    assert(firstEl(root).rawText == "acb")
  }

  test("trimRight truncates at pattern and drops following siblings") {
    val root = parse("<div>hello STOP world<span>x</span></div>")
    firstEl(root).trimRight("STOP".r)
    assert(firstEl(root).toHtml == "<div>hello </div>")
  }

  test("structure outline") {
    val root = parse("""<div id="a" class="x y"><p>text</p></div>""")
    assert(firstEl(root).structure == "div#a.x.y\n  p\n    #text")
  }

  test("structure keeps exact indentation at depths the reference can serve") {
    // reference structure (src/index.ts:347) recurses one frame per level;
    // our indent cap (8192) must be far beyond any depth it can reach
    // without a JS RangeError — at 300 deep, indentation is exact
    val depth = 300
    val root = parse("<div>" * depth + "x" + "</div>" * depth)
    val lines = firstEl(root).structure.split("\n")
    assert(lines.length == depth + 1)
    assert(lines(0) == "div")
    assert(lines(depth - 1) == "  " * (depth - 1) + "div")
    assert(lines(depth) == "  " * depth + "#text")
  }

  test("structure indent cap bounds output on pathological depth") {
    // beyond 8192 levels (where the reference itself stack-overflows) the
    // indent freezes, keeping output O(doc × cap), not O(doc²)
    val depth = 9000
    val deepRoot = parse("<div>" * depth + "</div>" * depth)
    val lines = firstEl(deepRoot).structure.split("\n")
    assert(lines.length == depth)
    assert(lines(8500) == "  " * 8192 + "div")
  }

  test("structure total-output bound truncates with a marker instead of building a multi-GB string") {
    // the public cap sits at V8's max string length (2^29) so anything we
    // truncate the reference could not materialize either; pinned here via
    // the package-private capped variant with a small budget
    val root = parse("<div><p>a</p><p>b</p><p>c</p></div>")
    val full = firstEl(root).structureCapped(Long.MaxValue)
    assert(full == firstEl(root).structure) // real docs: bound invisible
    val cut = firstEl(root).structureCapped(10)
    val lines = cut.split("\n")
    assert(lines.last == "[structure truncated: output exceeds JS string limit]")
    assert(lines.length < full.split("\n").length + 1)
    assert(full.startsWith(lines.dropRight(1).mkString("\n")))
    // no lying marker: if the cap trips on the FINAL node (nothing was
    // skipped), the complete output must come back unannotated
    val tiny = parse("<div></div>")
    assert(firstEl(tiny).structureCapped(3) == "div")
  }

  // ---- entity codec (html-entities@2.3.2 defaults) ----

  test("decode named, legacy, numeric entities") {
    assert(Entities.decode("2&amp;") == "2&")
    assert(Entities.decode("&lt;x&gt;") == "<x>")
    assert(Entities.decode("&nbsp;") == "\u00a0")
    assert(Entities.decode("&nbsp") == "\u00a0") // legacy no-semicolon
    assert(Entities.decode("&amp") == "&")
    assert(Entities.decode("&apos") == "&apos") // apos is NOT legacy
    assert(Entities.decode("&apos;") == "'")
    assert(Entities.decode("&#39;") == "'")
    assert(Entities.decode("&#x27;") == "'")
    assert(Entities.decode("&#9650;") == "▲")
    assert(Entities.decode("&#0;") == "�") // numeric remap
    assert(Entities.decode("&#128;") == "€") // cp1252 remap
    assert(Entities.decode("&#x1F600;") == new String(Character.toChars(0x1F600)))
    assert(Entities.decode("&unknown;") == "&unknown;")
    assert(Entities.decode("&unknownthing") == "&unknownthing")
    assert(Entities.decode("a & b") == "a & b")
    assert(Entities.decode("&eacute;t&eacute") == "été")
  }

  test("decode uses WHATWG longest-match legacy-prefix semantics") {
    // cross-checked against Python html.unescape (spec-conformant)
    assert(Entities.decode("&copyright;") == "©right;")
    assert(Entities.decode("&ampx") == "&x")
    assert(Entities.decode("&notin;") == "∉") // full name beats prefix
    assert(Entities.decode("&notit;") == "¬it;")
    assert(Entities.decode("&ltx;") == "<x;")
    assert(Entities.decode("&euroX") == "&euroX") // euro is not legacy
  }

  test("encode escapes only special chars") {
    assert(Entities.encodeSpecial("!$$&") == "!$$&amp;")
    assert(Entities.encodeSpecial("<a b='c'>\"") == "&lt;a b=&apos;c&apos;&gt;&quot;")
    assert(Entities.encodeSpecial("plain é ") == "plain é ")
  }

  test("Js helpers match JS semantics") {
    assert(Js.splitWs("a b ").toSeq == Seq("a", "b", ""))
    assert(Js.splitWs(" a").toSeq == Seq("", "a"))
    assert(Js.splitWs("").toSeq == Seq(""))
    assert(Js.collapseWs2("a  b c") == "a b c")
    assert(Js.collapseWs2("a b") == "a b")
    assert(Js.collapseWs2("a\n\tb") == "a b")
    assert(Js.trim(" x ") == "x")
    assert(Js.trimRight("x \n") == "x")
  }

  test("exchangeChild replaces in place without setting new parent (quirk)") {
    val root = parse("<div><p>a</p><span>b</span></div>")
    val div = firstEl(root)
    val p = div.childNodes(0)
    val repl = new Element("em", "")
    repl.appendChild(new TextNode("c"))
    div.exchangeChild(p, repl)
    assert(div.toHtml == "<div><em>c</em><span>b</span></div>")
    assert(repl.parentNode == null) // quirk: exchangeChild does not set it
    assert(p.parentNode == null)
  }

  test("toJSON produces the reference shape") {
    val root = parse("""<p a="1">x<!--c--></p>""", ParseOptions(comment = true))
    assert(firstEl(root).toJsonString ==
      """{"type":"element","tagName":"p","attributes":{"a":"1"},"children":[{"type":"text","value":"x"},{"type":"comment","value":"c"}]}""")
  }

  test("pre option keeps raw text; noscript never keeps") {
    val root = parse("<pre>  a  <b>  </pre>", ParseOptions(pre = true))
    val pre = firstEl(root)
    assert(pre.childNodes.length == 1)
    assert(pre.rawText == "  a  <b>  ")
    val root2 = parse("<pre>x</pre>")
    assert(firstEl(root2).childNodes.isEmpty)
    val root3 = parse("<noscript>x</noscript>", ParseOptions(script = true, style = true, pre = true))
    assert(firstEl(root3).childNodes.isEmpty)
  }

  test("querySelectorAll with a Matcher instance skips comma-union dedup") {
    // "div div" over 3 nested divs: the dual rewound/advanced exploration
    // emits div3 via two paths → raw result [div3, div2, div3]; the string
    // path dedups to 2 (reference Set semantics, src/index.ts:408)
    val root = parse("""<div id="1"><div id="2"><div id="3"></div></div></div>""")
    val m = new Matcher("div div")
    val raw = Query.querySelectorAll(root, m)
    assert(raw.map(_.id).toSeq == Seq("3", "2", "3"))
    assert(root.querySelectorAll("div div").map(_.id).toSeq == Seq("3", "2"))
  }

  test("isBlock uses the 40-entry lowercased tag list") {
    assert(Element.isBlock(HtmlParser.parse("<DIV></DIV>").firstChild.asInstanceOf[Element]))
    assert(Element.isBlock(HtmlParser.parse("<h3></h3>").firstChild.asInstanceOf[Element]))
    assert(!Element.isBlock(HtmlParser.parse("<span></span>").firstChild.asInstanceOf[Element]))
    assert(!Element.isBlock(new TextNode("x")))
  }
}
