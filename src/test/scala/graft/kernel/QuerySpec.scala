package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Re-encoding of querySelector/querySelectorAll cases
  * (/root/reference/test/html.test.ts:571–612) and the full attribute
  * operators suite (/root/reference/test/attribute-operators.test.ts).
  */
class QuerySpec extends AnyFunSuite {

  private def parse(s: String) = HtmlParser.parse(s)

  // html.test.ts:571–585
  test("querySelector finds correct elements") {
    val root = parse("""<a id="id" data-id="myid"><div><span class="a b"></span><span></span><span></span></div></a>""")
    val childA = root.firstChild.asInstanceOf[Element]
    val div = childA.firstChild.asInstanceOf[Element]
    val span1 = div.firstChild.asInstanceOf[Element]
    assert(root.querySelector("#id").get eq childA)
    assert(root.querySelector("span.a").get eq span1)
    assert(root.querySelector("span.b").get eq span1)
    assert(root.querySelector("span.a.b").get eq span1)
    assert(root.querySelector("#id .b").get eq span1)
    assert(root.querySelector("#id span").get eq span1)
    assert(root.querySelector("[data-id=myid]").get eq childA)
    assert(root.querySelector("""[data-id="myid"]""").get eq childA)
  }

  // html.test.ts:587–599
  test("querySelectorAll finds correct element sets") {
    val root = parse("""<a id="id"><div><span id="3" class="a b"></span><span></span><span></span></div></a>""")
    val child = root.firstChild.asInstanceOf[Element]
    val grandChild = child.firstChild.asInstanceOf[Element]
    val spans = grandChild.children.toSeq
    assert(root.querySelectorAll("#id").toSeq.map(e => e: AnyRef) == Seq(child))
    assert(root.querySelectorAll("span.a").head eq spans(0))
    assert(root.querySelectorAll("span.b").head eq spans(0))
    assert(root.querySelectorAll("span.a.b").head eq spans(0))
    assert(root.querySelectorAll("#id .b").toSeq.map(e => e: AnyRef) == Seq(spans(0)))
    assert(root.querySelectorAll("#id span").toSeq.map(e => e: AnyRef) == spans.map(e => e: AnyRef))
    assert(root.querySelectorAll("#id, #id .b").toSeq.map(e => e: AnyRef) == Seq(child, spans(0)))
  }

  // html.test.ts:600–603
  test("comma union dedups by identity") {
    val root = parse("""<time class="date">""")
    val res = root.querySelectorAll("time,.date")
    assert(res.length == 1)
    assert(res.head eq root.firstChild)
  }

  // html.test.ts:604–607
  test("nested same-tag elements all returned") {
    val root = parse("<div><div></div></div>")
    assert(root.querySelectorAll("div").length == 2)
  }

  // html.test.ts:608–611
  test("results in document order for flat selector") {
    val root = parse("""<div id="1"><div id="2"></div><div id="3"></div></div>""")
    assert(root.querySelectorAll("div").map(_.id).mkString(",") == "1,2,3")
  }

  // ---- attribute-operators.test.ts ----

  test("[attr] existence") { // :4–9
    val root = parse("""<a href="https://example.com">Link</a><span>Text</span>""")
    assert(root.querySelector("[href]").get.tagName == "a")
  }

  test("[attr=value] exact match") { // :11–20
    val root = parse("""<input type="text" name="username"><input type="email" name="email">""")
    assert(root.querySelector("""[type="text"]""").get.attributes.get("type") == "text")
    assert(root.querySelector("""[type="email"]""").get.attributes.get("type") == "email")
  }

  test("[attr^=value] starts with") { // :22–31
    val root = parse("""<a href="https://example.com">HTTPS</a><a href="http://test.com">HTTP</a>""")
    assert(root.querySelector("""[href^="https://"]""").get.attributes.get("href") == "https://example.com")
    assert(root.querySelector("""[href^="http://"]""").get.attributes.get("href") == "http://test.com")
  }

  test("[attr$=value] ends with") { // :33–42
    val root = parse("""<a href="https://example.com">Link 1</a><a href="https://test.org">Link 2</a>""")
    assert(root.querySelector("""[href$=".com"]""").get.attributes.get("href") == "https://example.com")
    assert(root.querySelector("""[href$=".org"]""").get.attributes.get("href") == "https://test.org")
  }

  test(".com in attr value is not a class selector") { // :44–53
    val root = parse("""<a href="https://example.com">Website</a><span class="com">Not a link</span>""")
    val result = root.querySelector("""[href$=".com"]""").get
    assert(result.tagName == "a")
    assert(result.attributes.get("class") == null)
  }

  test("[attr*=value] contains") { // :55–64
    val root = parse("""<div class="btn-primary">Button 1</div><div class="btn-secondary">Button 2</div>""")
    assert(root.querySelector("""[class*="primary"]""").get.attributes.get("class") == "btn-primary")
    assert(root.querySelector("""[class*="secondary"]""").get.attributes.get("class") == "btn-secondary")
  }

  test("[attr!=value] not equal") { // :66–76
    val root = parse("""<input type="text" name="username"><input type="hidden" name="token">""")
    assert(root.querySelector("""[type!="hidden"]""").get.attributes.get("type") == "text")
    assert(root.querySelector("""[type!="text"]""").get.attributes.get("type") == "hidden")
  }

  test("[attr|=value] hyphen operator") { // :78–85
    val root = parse("""<span lang="en">English</span><span lang="en-US">American</span><span lang="fr">French</span>""")
    val en = root.querySelectorAll("""[lang|="en"]""")
    assert(en.length == 2)
    assert(en(0).attributes.get("lang") == "en")
    assert(en(1).attributes.get("lang") == "en-US")
  }

  test("[attr~=value] word operator") { // :87–96
    val root = parse("""<div class="btn primary large">Button</div><div class="secondary small">Other</div>""")
    assert(root.querySelector("""[class~="primary"]""").get.attributes.get("class") == "btn primary large")
    assert(root.querySelector("""[class~="large"]""").get.attributes.get("class") == "btn primary large")
  }

  test("multiple attributes in one selector") { // :98–105
    val root = parse("""<input type="email" name="user-email" required>""")
    val result = root.querySelector("""input[type="email"][required]""").get
    assert(result.attributes.get("type") == "email")
    assert(result.attributes.get("required") == "")
  }

  test("complex tag.class#id[attr^=] selector") { // :107–116
    val root = parse("""<a href="tel:+1234567890" class="phone-link" id="phone1">Phone</a>""")
    val result = root.querySelector("""a.phone-link#phone1[href^="tel:"]""").get
    assert(result.tagName == "a")
    assert(result.attributes.get("href") == "tel:+1234567890")
    assert(result.id == "phone1")
  }

  test("empty attribute values") { // :118–127
    val root = parse("""<input value="" required class="">""")
    assert(root.querySelector("""[value=""]""").isDefined)
    assert(root.querySelector("[required]").isDefined)
    assert(root.querySelector("""[class=""]""").isDefined)
    assert(root.querySelector("""[value^=""]""").isDefined)
    assert(root.querySelector("""[value$=""]""").isDefined)
    assert(root.querySelector("""[value*=""]""").isDefined)
  }

  test("special characters and dots in values") { // :129–137
    val root = parse("""<div data-test="hello.world-test_123" data-url="https://site.com/path.html">Content</div>""")
    assert(root.querySelector("""[data-test^="hello."]""").isDefined)
    assert(root.querySelector("""[data-test$="_123"]""").isDefined)
    assert(root.querySelector("""[data-test*="world-test"]""").isDefined)
    assert(root.querySelector("""[data-url$=".html"]""").isDefined)
    assert(root.querySelector("""[data-url*=".com"]""").isDefined)
  }

  test("multiple attributes with complex values") { // :139–148
    val root = parse("""<input type="email" name="user-email" data-validation="email.required" required>""")
    val result = root.querySelector("""input[type="email"][name^="user"][data-validation*=".required"][required]""").get
    assert(result.attributes.get("name") == "user-email")
    assert(result.attributes.get("data-validation") == "email.required")
  }

  test("case sensitivity of attribute names and values") { // :150–162
    val root = parse("""<div class="Test" data-value="CamelCase">Content</div>""")
    assert(root.querySelector("""[class="Test"]""").isDefined)
    assert(root.querySelector("""[CLASS="Test"]""").isEmpty)
    assert(root.querySelector("""[class="test"]""").isEmpty)
    assert(root.querySelector("""[data-value^="Camel"]""").isDefined)
    assert(root.querySelector("""[data-value^="camel"]""").isEmpty)
  }

  test("whitespace in attribute values") { // :164–173
    val root = parse("""<div class=" btn  primary " title="  Hello World  ">Content</div>""")
    assert(root.querySelector("""[title^="  Hello"]""").isDefined)
  }

  test("|= edge cases") { // :175–189
    val root = parse("""
			<span lang="en">English</span>
			<span lang="en-US">American English</span>
			<span lang="en-GB-scotland">Scottish English</span>
			<span lang="english">Not a language code</span>
			<span lang="fr">French</span>
		""")
    val en = root.querySelectorAll("""[lang|="en"]""")
    assert(en.length == 3)
    assert(root.querySelector("""[lang|="english"]""").isDefined)
    assert(!en.exists(_.attributes.get("lang") == "english"))
  }

  test("~= edge cases") { // :191–203
    val root = parse("""
			<div class="btn primary large">Button 1</div>
			<div class="btn secondary">Button 2</div>
			<div class="primary-btn">Button 3</div>
			<div class="btn-primary">Button 4</div>
		""")
    assert(root.querySelectorAll("""[class~="btn"]""").length == 2)
    assert(root.querySelectorAll("""[class~="primary"]""")(0).text == "Button 1")
    assert(root.querySelector("""[class~="primary-btn"]""").get.text == "Button 3")
    assert(root.querySelector("""[class~="btn-primary"]""").get.text == "Button 4")
  }

  test("quotes inside attribute values") { // :205–210
    val root = parse("""<div data-test='value with "quotes"' title="value with 'apostrophes'">Content</div>""")
    assert(root.querySelector("""[data-test*="quotes"]""").isDefined)
    assert(root.querySelector("""[title*="apostrophes"]""").isDefined)
  }

  test("non-existent attributes") { // :212–220
    val root = parse("""<div class="test">Content</div>""")
    assert(root.querySelector("[id]").isEmpty)
    assert(root.querySelector("""[id=""]""").isEmpty)
    assert(root.querySelector("""[id^="test"]""").isEmpty)
    assert(root.querySelector("""[nonexistent*="anything"]""").isEmpty)
    assert(root.querySelector("""[data-missing~="word"]""").isEmpty)
  }

  test("complex nested selectors with attributes") { // :222–242
    val root = parse("""
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
		""")
    assert(root.querySelector("""article.post [data-paragraph="1"]""").isDefined)
    assert(root.querySelector(""".content a[href^="https://"][target="_blank"]""").isDefined)
    assert(root.querySelector("""a[href$=".html"][class="internal"]""").isDefined)
    assert(root.querySelectorAll("article [data-paragraph]").length == 2)
    assert(root.querySelectorAll(".content a[href]").length == 2)
  }

  test("non-matching complex selectors return None") { // :244–252
    val root = parse("""<a href="https://example.com" class="link">Website</a>""")
    assert(root.querySelector("""a[href^="invalid:"]""").isEmpty)
    assert(root.querySelector("""a[href$="invalid"]""").isEmpty)
    assert(root.querySelector("""a[href*="invalid"]""").isEmpty)
    assert(root.querySelector("""a[class~="invalid"]""").isEmpty)
    assert(root.querySelector("""a[href^="https://"][class="invalid"]""").isEmpty)
  }

  test("spaces inside attribute values of descendant selectors") { // :254–269
    val root = parse("""
			<div title="Hello World" class="container">
				<p data-text="Multi word value">Content</p>
				<span alt="Some description here">Text</span>
			</div>
		""")
    assert(root.querySelector("""div[title="Hello World"] p[data-text="Multi word value"]""").isDefined)
    assert(root.querySelector("""div[title="Hello World"] span[alt="Some description here"]""").isDefined)
    assert(root.querySelector("""div[title="Hello"] p""").isEmpty)
    assert(root.querySelector("""div p[data-text="Multi"]""").isEmpty)
  }

  // brokenHtml.test.ts:26–29
  test("missing close tags still queryable") {
    val missingCloseTags = """<table id="liste">
        <span id="nbResultats">Nombre de résultats : 3308</span><br>
                    <tr style='border: 1px solid #ddd'>
                <td><a class="lien-bouton" href="/detail/0441111U"><b>ECOLE PRIMAIRE PRIVEE
                                                            ST JOSEPH
                                                <br>
                            ABBARETZ (44)
                    <br>
                    </a>
                </td>
            </tr>
                    <tr style='border: 1px solid #ddd'>
                <td><a class="lien-bouton" href="/detail/0441527W"><b>ECOLE PRIMAIRE PUBLIQUE
                                                            LOUIS DAVY
                                                <br>
                            ABBARETZ (44)
                    <br>
                    </a>
                </td>
            </tr>
</table>"""
    val root = HtmlParser.parse(missingCloseTags)
    assert(root.querySelectorAll("tr").length == 2)
  }

  // brokenHtml.test.ts:31–39
  test("missing space between attributes") {
    val root = parse("<body>\n  <div class=\"a\"data-test=\"/test.jpg\"></div>\n  <div class=\"b\"style=\"background-image:url('test.jpg')\"></div>\n</body>")
    assert(root.children(0).children.length == 2)
    assert(root.children(0).children(0).attributes.get("data-test") == "/test.jpg")
    assert(root.children(0).children(1).attributes.get("style") == "background-image:url('test.jpg')")
  }

  test("op-less attr blocks merge with following blocks (pinned quirk)") {
    // the reference's attr regex key class includes '[' and ']', so
    // [href][target=_blank] compiles to ONE predicate keyed 'href][target'
    // (verified against the reference regex in node) — it matches nothing
    val root = parse("""<a href="x" target="_blank">L</a>""")
    assert(root.querySelector("""a[href][target=_blank]""").isEmpty)
    assert(root.querySelector("""a[href][target="_blank"]""").isEmpty)
    // with an op in the first block the key is cut at '=' and blocks split
    assert(root.querySelector("""a[href="x"][target="_blank"]""").isDefined)
    // a single op-less block is fine
    assert(root.querySelector("a[href]").isDefined)
  }
}
