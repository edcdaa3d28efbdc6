package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Re-encoding of rawAttributes / attributes / setAttribute(s) suites
  * (/root/reference/test/html.test.ts:489–569).
  */
class AttributesSpec extends AnyFunSuite {

  private def parse(s: String) = HtmlParser.parse(s)
  private def firstEl(root: Element): Element = root.firstChild.asInstanceOf[Element]
  private def toMap(m: java.util.LinkedHashMap[String, String]): Seq[(String, String)] =
    m.entrySet().iterator().asScala.map(e => e.getKey -> e.getValue).toSeq

  // html.test.ts:489–499
  test("rawAttributes returns as-written values") {
    val child = firstEl(parse("<p a=12 data-id=\"!$$&amp;\" yAz='1'></p>"))
    assert(toMap(child.rawAttributes) ==
      Seq("a" -> "12", "data-id" -> "!$$&amp;", "yAz" -> "1"))
  }

  // html.test.ts:501–513
  test("attributes returns decoded values incl. empty/bare") {
    val child = firstEl(parse("<p a=12 data-id=\"!$$&amp;\" yAz='1' class=\"\" disabled></p>"))
    assert(toMap(child.attributes) ==
      Seq("a" -> "12", "data-id" -> "!$$&", "yAz" -> "1",
        "class" -> "", "disabled" -> ""))
    // class="" → the ctor mini-regex's bare (\S+) fallback captures the two
    // quote chars as the class value (verified against the JS regex in node)
    assert(child.classNames.toSeq == Seq("\"\""))
  }

  // html.test.ts:515–524
  test("setAttribute edits an attribute") {
    val child = firstEl(parse("<p a=12></p>"))
    child.setAttribute("a", "13")
    assert(toMap(child.attributes) == Seq("a" -> "13"))
    assert(child.toHtml == "<p a=\"13\"></p>")
  }

  // html.test.ts:525–536
  test("setAttribute adds attributes; empty value renders bare") {
    val child = firstEl(parse("<p a=12></p>"))
    child.setAttribute("b", "13")
    assert(toMap(child.attributes) == Seq("a" -> "12", "b" -> "13"))
    assert(child.toHtml == "<p a=\"12\" b=\"13\"></p>")
    child.setAttribute("required", "")
    assert(child.toHtml == "<p a=\"12\" b=\"13\" required></p>")
  }

  // html.test.ts:537–544
  test("setAttribute with newline survives a round trip") {
    val root = parse("<p></p>")
    val child = firstEl(root)
    child.setAttribute("b", "test\ntest")
    val reparsed = firstEl(parse(root.innerHTML))
    assert(toMap(reparsed.attributes) == Seq("b" -> "test\ntest"))
  }

  // html.test.ts:545–556
  test("setAttribute(key, null) removes; re-encodes on serialize") {
    val child = firstEl(parse("<p a=12 b=13 c=14 data-id=\"!$$&amp;\"></p>"))
    child.setAttribute("b", null)
    child.setAttribute("c", null)
    assert(toMap(child.attributes) == Seq("a" -> "12", "data-id" -> "!$$&"))
    assert(child.toHtml == "<p a=\"12\" data-id=\"!$$&amp;\"></p>")
  }

  // html.test.ts:559–569
  test("setAttributes replaces everything") {
    val child = firstEl(parse("<p a=12 data-id=\"!$$&amp;\" yAz='1' class=\"\" disabled></p>"))
    child.setAttributes(Seq("c" -> "12"))
    assert(toMap(child.attributes) == Seq("c" -> "12"))
    assert(child.toHtml == "<p c=\"12\"></p>")
  }

  test("id/class ctor extraction edge cases (verified against JS regex)") {
    // quoted empty values fall through to the bare (\S+) alternative, which
    // captures the quote characters themselves
    assert(firstEl(parse("<p id=\"\"></p>")).id == "\"\"")
    assert(firstEl(parse("<p class=\"\"></p>")).classNames.toSeq == Seq("\"\""))
    // bare values accepted
    assert(firstEl(parse("<p id=x></p>")).id == "x")
    // uppercase key is consumed but does not set the shorthand (quirk)
    assert(firstEl(parse("<p ID=x></p>")).id == "")
    // multi-class
    assert(firstEl(parse("<p class='a b'></p>")).classNames.toSeq == Seq("a", "b"))
    // last occurrence wins
    assert(firstEl(parse("<p id=a id=b></p>")).id == "b")
  }
}
