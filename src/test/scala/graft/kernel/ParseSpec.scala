package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Re-encoding of /root/reference/test/html.test.ts — parse(), validation,
  * stringify, custom elements (file:line cited per case).
  */
class ParseSpec extends AnyFunSuite {

  private def parse(s: String, o: ParseOptions = ParseOptions()) = HtmlParser.parse(s, o)
  private def firstEl(root: Element): Element = root.firstChild.asInstanceOf[Element]

  // html.test.ts:48–62
  test("parse <p id=..><a class='cls'>Hello</a><ul><li><li></ul><span></span></p>") {
    val root = parse("""<p id="id"><a class='cls'>Hello</a><ul><li><li></ul><span></span></p>""")
    val p = firstEl(root)
    assert(p.tagName == "p" && p.id == "id")
    assert(p.childNodes.length == 3)
    val a = p.childNodes(0).asInstanceOf[Element]
    assert(a.tagName == "a" && a.classNames.toSeq == Seq("cls"))
    assert(a.childNodes.length == 1 && a.firstChild.asInstanceOf[TextNode].value == "Hello")
    val ul = p.childNodes(1).asInstanceOf[Element]
    assert(ul.tagName == "ul" && ul.children.map(_.tagName).toSeq == Seq("li", "li"))
    assert(p.childNodes(2).asInstanceOf[Element].tagName == "span")
  }

  // html.test.ts:64–78
  test("lowerCaseTagName parses <DIV><a><img/></A><p></P></div>") {
    val root = parse("<DIV><a><img/></A><p></P></div>", ParseOptions(lowerCaseTagName = true))
    val div = firstEl(root)
    assert(div.tagName == "div")
    assert(div.toHtml == "<div><a><img /></a><p></p></div>")
  }

  // html.test.ts:80–92
  test("parse <div><a><img/></a><p></p></div>") {
    val root = parse("<div><a><img/></a><p></p></div>")
    assert(firstEl(root).toHtml == "<div><a><img /></a><p></p></div>")
  }

  // html.test.ts:94–98
  test("round-trip <tr><th></th></tr>") {
    val a = "<tr><th></th></tr>"
    assert(firstEl(parse(a)).toHtml == a)
  }

  // html.test.ts:100–108
  test("text + br round trips") {
    assert(parse("this is text<br />").outerHTML == "this is text<br />")
    assert(parse("this is text<br /> with 2<br />").outerHTML == "this is text<br /> with 2<br />")
  }

  // html.test.ts:110–116
  test("bare text node") {
    val root = parse("text node")
    assert(root.firstChild.asInstanceOf[TextNode].value == "text node")
  }

  // html.test.ts:118–126
  test("comments dropped by default") {
    val root = parse("<div><a><!-- my comment --></a></div>")
    val div = firstEl(root)
    assert(div.toHtml == "<div><a></a></div>")
  }

  // html.test.ts:128–137
  test("comments kept with option") {
    val root = parse("<div><a><!-- my comment --></a></div>", ParseOptions(comment = true))
    val a = firstEl(root).firstChild.asInstanceOf[Element]
    assert(a.childNodes.length == 1)
    assert(a.firstChild.asInstanceOf[CommentNode].value == " my comment ")
  }

  // html.test.ts:139–147
  test("HTML inside comments is not parsed") {
    val root = parse("<div><!--<a></a>--></div>", ParseOptions(comment = true))
    val div = firstEl(root)
    assert(div.childNodes.length == 1)
    assert(div.firstChild.asInstanceOf[CommentNode].value == "<a></a>")
  }

  // html.test.ts:149–152
  test("parent is set when adding nodes") {
    val root = parse("<div>a</div><div>b</div>", ParseOptions(comment = true))
    assert(firstEl(root).parentNode eq root)
  }

  // html.test.ts:154–164
  test("picture element with void source/img") {
    val root = parse("""<picture><source srcset="/images/example-1.jpg 1200w, /images/example-2.jpg 1600w" sizes="100vw"><img src="/images/example.jpg" alt="Example"/></picture>""")
    val picture = firstEl(root)
    assert(picture.tagName == "picture")
    assert(picture.children.map(_.tagName).toSeq == Seq("source", "img"))
    assert(picture.children(0).rawAttrs ==
      """srcset="/images/example-1.jpg 1200w, /images/example-2.jpg 1600w" sizes="100vw"""")
  }

  // html.test.ts:166–173
  test("script/style text dropped by default") {
    val root = parse("<script>1</script><style>2</style>")
    assert(root.firstChild.asInstanceOf[Element].childNodes.isEmpty)
    assert(root.lastChild.asInstanceOf[Element].childNodes.isEmpty)
  }

  // html.test.ts:175–189
  test("script/style text kept when asked") {
    val root = parse("<script>1</script><style>2&amp;</style>",
      ParseOptions(script = true, style = true))
    val sc = root.firstChild.asInstanceOf[Element]
    val st = root.lastChild.asInstanceOf[Element]
    assert(sc.childNodes.length == 1 && sc.text == "1")
    assert(st.childNodes.length == 1)
    assert(st.text == "2&")
    assert(st.rawText == "2&amp;")
  }

  // html.test.ts:199–202
  test("namespaces round trip") {
    val ns = "<ns:identifier>content</ns:identifier>"
    assert(parse(ns).toHtml == ns)
  }

  // html.test.ts:220–236
  test("nested article round trips byte-identically") {
    val html = """
				<article class="post">
					<header>
						<h1 class="title">Post Title</h1>
					</header>
					<div class="content">
						<p data-paragraph="1">First paragraph</p>
						<p data-paragraph="2">Second paragraph</p>
						<a href="https://example.com" target="_blank" rel="noopener">External Link</a>
						<a href="/internal.html" class="internal">Internal Link</a>
					</div>
				</article>
			"""
    assert(parse(html).toHtml == html)
  }

  // html.test.ts:240–243
  test("self closing tags serialize with ' />'") {
    assert(parse("""<img src="test.jpg">""").toHtml == """<img src="test.jpg" />""")
    assert(parse("<meta charset=\"utf-8\" >").toHtml == """<meta charset="utf-8" />""")
  }

  // html.test.ts:253–258
  test("attr value containing > stays inside the tag") {
    val root = parse("<div attr='>'></div>")
    val child = firstEl(root)
    assert(child.tagName == "div")
    assert(child.attributes.get("attr") == ">")
  }

  // html.test.ts:260–269
  test("nested nodes round trip") {
    val html = "<body>\n\t<section>\n\t\t<section>word</section>\n\t</section>\n\t<p>test</p>\n</body>"
    assert(parse(html).outerHTML == html)
  }

  // html.test.ts:271–279
  test("malformed junk attributes are tolerated") {
    val root = parse("<span id='tree-title-end' ;=\"\" test='a' \"random text\" 'more text' \"=\"\" '=' class='editable'></span>")
    val child = firstEl(root)
    assert(child.tagName == "span")
    assert(child.attributes.get("id") == "tree-title-end")
    assert(child.attributes.get("class") == "editable")
  }

  // html.test.ts:281–287
  test("malformed junk after src attribute") {
    val root = parse("<img src=\"https://bienalecole.fr/wp-content/uploads/2023/05/icon1.png\" \"=\"\">")
    val child = firstEl(root)
    assert(child.tagName == "img")
    assert(child.attributes.get("src") == "https://bienalecole.fr/wp-content/uploads/2023/05/icon1.png")
  }

  // html.test.ts:289–302
  test("multiline svg") {
    val root = parse("<svg viewBox=\"0 0 16 15\" fill=\"none\" xmlns=\"http://www.w3.org/2000/svg\">\n    <path\n        d=\"M14.0669 1.66309L2.03027 13.259\"\n    />\n    <path\n        d=\"M2.03027 1.66309L14.0669 13.259\"\n    />\n</svg>\n")
    val child = firstEl(root)
    assert(child.tagName == "svg")
    assert(child.children.length == 2)
  }

  // html.test.ts:304–307
  test("root element has empty tagName") {
    assert(parse("").tagName == "")
  }

  // html.test.ts:309–325
  test("table with colgroup/col/tr") {
    val root = parse("<table data-id=\"390643da-3423-45a4-9922-4f408258a0d6\" data-plugin-name=\"table\">\n\t\t<colgroup>\n\t\t\t<col style=\"\"></col>\n\t\t\t<col style=\"\"></col>\n\t\t</colgroup>\n\t\t<tr>\n\t\t\t<td><p>content 1</p></td>\n\t\t\t<td><p>content 2</p></td>\n\t\t</tr>\n\t\t<tr>\n\t\t\t<td><p>content 3</p></td>\n\t\t\t<td><p>content 4</p></td>\n\t\t</tr>\n\t</table>")
    assert(root.children(0).children.map(_.tagName).mkString(",") == "colgroup,tr,tr")
  }

  // html.test.ts:327–330
  test("querySelector on namespaced tag") {
    val root = parse("<ns:identifier>content</ns:identifier>")
    assert(root.querySelector("ns:identifier").get.toHtml == "<ns:identifier>content</ns:identifier>")
  }

  // html.test.ts:332–336
  test("simple script round trips") {
    val html = "<script src='story_content/triggers.js' type=text/javascript></script>"
    val root = parse(html)
    assert(root.querySelector("script").get.outerHTML == html)
  }

  // html.test.ts:338–343
  test("/> inside quoted attribute is not self-closing") {
    val root = parse("<div attr='/>'></div>")
    val child = firstEl(root)
    assert(child.tagName == "div")
    assert(child.toHtml == "<div attr='/>'></div>")
  }

  // html.test.ts:345–352
  test("unquoted value containing slash + self close") {
    val root = parse("<img src=/images/icon.png data=text/javascript />")
    val child = firstEl(root)
    assert(child.tagName == "img")
    assert(child.attributes.get("src") == "/images/icon.png")
    assert(child.attributes.get("data") == "text/javascript")
    assert(child.toHtml == "<img src=/images/icon.png data=text/javascript />")
  }

  // html.test.ts:354–360
  test("non-void tag self-closed with /> keeps attributes") {
    val root = parse("<div data=foo/>")
    val child = firstEl(root)
    assert(child.tagName == "div")
    assert(child.attributes.get("data") == "foo")
    assert(child.toHtml == "<div data=foo></div>")
  }

  // html.test.ts:362–368
  test("slash at end of value not followed by > is part of the value") {
    val root = parse("<div data=foo/ ></div>")
    val child = firstEl(root)
    assert(child.tagName == "div")
    assert(child.attributes.get("data") == "foo/")
    assert(child.toHtml == "<div data=foo/></div>")
  }

  // ---- parseWithValidation (html.test.ts:371–436) ----

  // html.test.ts:374–378
  test("<p><p></p> is valid, fixed to <p></p><p></p>") {
    val r = parse("<p><p></p>")
    assert(r.valid)
    assert(r.toHtml == "<p></p><p></p>")
  }

  // html.test.ts:380–384
  test("<p><p/></p> is valid, stays nested") {
    val r = parse("<p><p/></p>")
    assert(r.valid)
    assert(r.toHtml == "<p><p></p></p>")
  }

  // html.test.ts:386–390
  test("<p><h3></p> is valid") {
    val r = parse("<p><h3></p>")
    assert(r.valid)
    assert(r.toHtml == "<p></p><h3></h3>")
  }

  // html.test.ts:414–418
  test("repair <div data-id=1><h3 data-id=2><h3><div>") {
    val r = parse("<div data-id=1><h3 data-id=2><h3><div>")
    assert(!r.valid)
    assert(r.toHtml == "<div data-id=1><h3 data-id=2></h3></div>")
  }

  // html.test.ts:420–424
  test("repair <div><h3><h3><span><span><div>") {
    val r = parse("<div><h3><h3><span><span><div>")
    assert(!r.valid)
    assert(r.toHtml == "<div><h3></h3><span></span></div>")
  }

  // ---- stringify (html.test.ts:671–696) ----

  test("toString round trips attributes and nesting") {
    val html = """<p id="id" data-feidao-actions="ssss"><a class='cls'>Hello</a><ul><li>aaaaa</li></ul><span>bbb</span></p>"""
    assert(parse(html).toHtml == html)
  }

  test("toString drops comments by default") {
    assert(parse("<p><!-- my comment --></p>").toHtml == "<p></p>")
  }

  test("toString keeps comments when specified") {
    val html = "<!----><p><!-- my comment --></p>"
    assert(parse(html, ParseOptions(comment = true)).toHtml == html)
  }

  test("toString returns encoded entities verbatim") {
    val html = "<p>&lt;</p>"
    assert(parse(html).toHtml == html)
  }

  // html.test.ts:698–703
  test("comment nodeType is 8") {
    val root = parse("<!-- my comment -->", ParseOptions(comment = true))
    assert(root.firstChild.nodeType == 8)
  }

  // html.test.ts:705–721
  test("custom elements keep hyphenated tag names") {
    assert(firstEl(parse("<my-widget></my-widget>")).tagName == "my-widget")
    assert(firstEl(parse("<my-new-widget></my-new-widget>")).tagName == "my-new-widget")
  }

  // html.test.ts:723–730
  test("font-family style attribute") {
    val root = parse("""<div style='font-family: "Nunito", "Arial", sans-serif'></div>""")
    assert(firstEl(root).attributes.get("style") == """font-family: "Nunito", "Arial", sans-serif""")
  }

  // html.test.ts:732–738
  test("background-image style attribute") {
    val root = parse("""<div class="a" style="background-image:url('test.jpg')"></div>""")
    val child = root.querySelector(".a").get
    assert(child.attributes.get("style") == "background-image:url('test.jpg')")
  }

  // doctype / processing instructions / stray < are text (kMarkupPattern
  // verified behavior, SURVEY.md §2.B)
  test("doctype and stray < become text nodes") {
    val root = parse("<!DOCTYPE html><p>x</p>")
    assert(root.firstChild.asInstanceOf[TextNode].value == "<!DOCTYPE html>")
    val root2 = parse("a < b > c")
    assert(root2.firstChild.asInstanceOf[TextNode].value == "a < b > c")
    assert(root2.childNodes.length == 1)
  }

  test("unterminated raw text consumes to EOF and invalidates") {
    val r = parse("<p><script>var x = 1;")
    assert(!r.valid)
  }

  test("stray closing tag pops to root") {
    // </foo> matches nothing: the unwind loop closes span AND div, the
    // trailing text lands on root, and the final </div> is a no-op — so the
    // document is still "valid" (src/index.ts:973–990 semantics)
    val r = parse("<div><span>x</foo>y</div>")
    assert(r.valid)
    assert(r.toHtml == "<div><span>x</span></div>y")
  }

  test("prototype-named tags replicate the reference's JS object-literal quirks") {
    // node-verified against the reference engine: options[tag],
    // kBlockTextElements[tag], kSelfClosingElements[tag] are all truthy for
    // Object.prototype member names, producing this exact behavior
    val r = parse("<toString>x</toString><p>y</p>")
    assert(!r.valid)
    assert(r.toHtml == "<toString>x<p>y</p></toString>")
    val r2 = parse("<li><toString>a</toString></li>")
    assert(r2.toHtml == "<li></li><toString>a</toString>")
    // '__proto__' cannot even be a tag (names must start with a letter)
    val r3 = parse("<__proto__>x</__proto__><p>y</p>")
    assert(r3.valid)
    assert(r3.toHtml == "<__proto__>x</__proto__><p>y</p>")
    // lowercase variants are plain elements
    assert(parse("<tostring>x</tostring>").toHtml == "<tostring>x</tostring>")
  }
}
