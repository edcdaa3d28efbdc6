package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Re-encoding of the Matcher state-machine suite
  * (/root/reference/test/html.test.ts:6–45).
  */
class MatcherSpec extends AnyFunSuite {

  test("matcher advances through '#id .a a.b *.a.b .a.b * a'") {
    val matcher = new Matcher("#id .a a.b *.a.b .a.b * a")
    val star = new Element("_", "")
    val withId = new Element("p", "id='id'")
    val withClass = new Element("a", "class='a b'")

    assert(!matcher.advance(star)) // #id
    assert(!matcher.advance(withClass)) // #id
    assert(matcher.advance(withId)) // #id

    assert(!matcher.advance(star)) // .a
    assert(!matcher.advance(withId)) // .a
    assert(matcher.advance(withClass)) // .a

    assert(!matcher.advance(star)) // a.b
    assert(!matcher.advance(withId)) // a.b
    assert(matcher.advance(withClass)) // a.b

    assert(!matcher.advance(withId)) // *.a.b
    assert(!matcher.advance(star)) // *.a.b
    assert(matcher.advance(withClass)) // *.a.b

    assert(!matcher.advance(withId)) // .a.b
    assert(!matcher.advance(star)) // .a.b
    assert(matcher.advance(withClass)) // .a.b

    assert(matcher.advance(withId)) // *
    matcher.rewind()
    assert(matcher.advance(star)) // *
    matcher.rewind()
    assert(matcher.advance(withClass)) // *

    assert(!matcher.advance(withId)) // a
    assert(!matcher.advance(star)) // a
    assert(matcher.advance(withClass)) // a

    assert(matcher.matched)
  }

  test("matcher clone shares checkers, copies level") {
    val m = new Matcher("div span")
    val el = new Element("div", "")
    assert(m.advance(el))
    val c = m.clone_()
    assert(c.level == 1)
    c.rewind()
    assert(c.level == 0 && m.level == 1)
    m.reset()
    assert(m.level == 0)
  }
}
