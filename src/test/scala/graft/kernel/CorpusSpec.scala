package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Real-world corpus validation (re-encoding of
  * /root/reference/test/html.test.ts:191–197, 247–249, 392–434). Corpus files
  * are read from the read-only reference checkout at test time (data only —
  * no code is taken); cases are skipped gracefully if absent.
  */
class CorpusSpec extends AnyFunSuite {

  private val dir = Paths.get("/root/reference/test/html")

  /** node's Buffer.toString() decodes as UTF-8 with replacement chars. */
  private def readUtf8(name: String): Option[String] = {
    val p = dir.resolve(name)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    else None
  }

  private def whenPresent(name: String)(f: String => Unit): Unit =
    readUtf8(name) match {
      case Some(html) => f(html)
      case None => cancel(s"corpus file $name not available")
    }

  // html.test.ts:392–395 — unclosed <p> on line 476, still valid
  test("hillcrestpartyrentals.html parses valid") {
    whenPresent("hillcrestpartyrentals.html") { html =>
      assert(HtmlParser.parse(html).valid)
    }
  }

  // html.test.ts:397–400
  test("google.html parses valid") {
    whenPresent("google.html")(html => assert(HtmlParser.parse(html).valid))
  }

  // html.test.ts:402–405
  test("gmail.html parses valid") {
    whenPresent("gmail.html")(html => assert(HtmlParser.parse(html).valid))
  }

  // html.test.ts:407–410 — extra opening <div>
  test("ffmpeg.html parses valid") {
    whenPresent("ffmpeg.html")(html => assert(HtmlParser.parse(html).valid))
  }

  // html.test.ts:191–197, 247–249
  test("incomplete-script parses without throwing (both option sets)") {
    whenPresent("incomplete-script") { html =>
      HtmlParser.parse(html, ParseOptions(script = true))
      HtmlParser.parse(html)
    }
  }

  // html.test.ts:426–434 — strip all '</' → must be invalid
  test("mutated gmail.html and nice.html are invalid") {
    whenPresent("gmail.html") { html =>
      assert(!HtmlParser.parse(html.replace("</", "<")).valid)
    }
    whenPresent("nice.html") { html =>
      assert(!HtmlParser.parse(html.replace("</", "<")).valid)
    }
  }

  // regression pins (self-generated, not reference-asserted): structural
  // stability of the kernel across rounds on the full corpus
  test("corpus extraction is deterministic and non-trivial") {
    Seq("google.html", "gmail.html", "ffmpeg.html", "nice.html",
      "hillcrestpartyrentals.html").foreach { name =>
      whenPresent(name) { html =>
        val root = HtmlParser.parse(html)
        val text = root.structuredText
        val text2 = HtmlParser.parse(html).structuredText
        assert(text == text2, s"$name structuredText must be deterministic")
        assert(text.nonEmpty, s"$name must extract non-empty text")
        // round-trip serialization is stable (parse(serialize(x)) fixpoint)
        val ser = root.toHtml
        assert(HtmlParser.parse(ser).toHtml == ser, s"$name serialize fixpoint")
      }
    }
  }
}
