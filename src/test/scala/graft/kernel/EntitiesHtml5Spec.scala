package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** NON-CIRCULAR differential test for the entity codec: expected outputs in
  * src/test/resources/entities_html5.tsv are computed by Python
  * `html.unescape` (tools/gen_entity_fixture.py) — independent of both
  * Entities.scala and the diff harness's entities_shim.js. Covers all 2,125
  * WHATWG names (each in 4 contexts), the legacy no-semicolon set,
  * prefix-collision probes, and numeric references in the range where
  * html.unescape and html-entities@2.3.2 agree (documented divergences —
  * surrogates, U+10FFFF, stripped controls — are excluded by the generator
  * and pinned separately below).
  */
class EntitiesHtml5Spec extends AnyFunSuite {

  private def unesc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => sb.append('\\'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case other => sb.append(c); sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private lazy val cases: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/entities_html5.tsv")
    assert(in != null, "fixture missing — run tools/gen_entity_fixture.py")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().map { line =>
      val t = line.indexOf('\t')
      (unesc(line.substring(0, t)), unesc(line.substring(t + 1)))
    }.toVector
    finally src.close()
  }

  test("decode matches Python html.unescape on all WHATWG names + contexts") {
    assert(cases.length > 8600)
    val bad = cases.filter { case (i, e) => Entities.decode(i) != e }
    assert(bad.isEmpty, s"${bad.length} mismatches, first 5: ${bad.take(5)}")
  }

  test("multi-codepoint entities decode to full sequences") {
    assert(Entities.decode("&NotEqualTilde;") == "≂̸")
    assert(Entities.decode("&bnequiv;") == "≡⃥")
    assert(Entities.decode("&fjlig;") == "fj")
    assert(Entities.decode("&ThickSpace;") == "  ")
  }

  test("HTML5-only names decode (the round-1 gap)") {
    assert(Entities.decode("&check;") == "✓")
    assert(Entities.decode("&star;") == "☆")
    assert(Entities.decode("&num;") == "#")
    assert(Entities.decode("&half;") == "½")
    assert(Entities.decode("&sol;") == "/")
    assert(Entities.decode("&lpar;") == "(")
    assert(Entities.decode("&NotSubset;") == "⊂⃒")
  }

  // html-entities semantics where html.unescape deliberately differs
  test("documented html-entities divergences from WHATWG html.unescape") {
    // lone surrogate passes through (String.fromCharCode semantics)
    assert(Entities.decode("&#xD800;") == "\uD800")
    // exactly U+10FFFF is out of bounds for html-entities (>= 0x10ffff)
    assert(Entities.decode("&#x10FFFF;") == "�")
    // C0 control passes through rather than being stripped
    assert(Entities.decode("&#1;") == "\u0001")
  }
}
