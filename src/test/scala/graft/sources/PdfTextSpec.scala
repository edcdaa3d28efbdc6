package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1

/** PDF text/layout extraction (graft.sources.PdfText): roundtrip through
  * the synthesizer, plus hand-authored content streams pinning each
  * operator / escape / filter path independently of the writer.
  */
class PdfTextSpec extends AnyFunSuite {

  private def rawPdf(content: String, dict: String = ""): Array[Byte] = {
    val c = content.getBytes(ISO_8859_1)
    val head = s"%PDF-1.4\n1 0 obj\n<< /Length ${c.length}$dict >>\nstream\n"
    val tail = "\nendstream\nendobj\n%%EOF\n"
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.getBytes(ISO_8859_1))
    out.write(c)
    out.write(tail.getBytes(ISO_8859_1))
    out.toByteArray
  }

  test("roundtrip: synthesize then extract is identity on lines") {
    val lines = Seq("Doc 42", "the quick brown fox jumps over the lazy dog " * 3)
    assert(PdfText.extractText(PdfText.synthesize(lines)) == lines.mkString("\n"))
  }

  test("roundtrip survives parens, backslashes, newlines in the text") {
    val lines = Seq("a(b)c \\ d", "nested ((x)) y\\n literal")
    assert(PdfText.extractText(PdfText.synthesize(lines)) == lines.mkString("\n"))
  }

  test("roundtrip preserves non-ASCII (UTF-8 byte payload)") {
    val lines = Seq("héllo wörld", "中文 текст ✓")
    assert(PdfText.extractText(PdfText.synthesize(lines)) == lines.mkString("\n"))
  }

  test("roundtrip with empty middle line keeps the line") {
    val lines = Seq("top", "", "bottom")
    assert(PdfText.extractText(PdfText.synthesize(lines)) == "top\n\nbottom")
  }

  test("uncompressed synthesis also roundtrips") {
    val lines = Seq("plain", "stream")
    assert(PdfText.extractText(PdfText.synthesize(lines, flate = false)) ==
      "plain\nstream")
  }

  test("Tj and ' and \" show operators") {
    val pdf = rawPdf("BT 12 TL (one) Tj (two) ' (three) \" ET"
      .replace("(three) \"", "0 0 (three) \""))
    assert(PdfText.extractText(pdf) == "one\ntwo\nthree")
  }

  test("TJ array: kerning below the word-break bar joins, above inserts a space") {
    val pdf = rawPdf("BT [(foo) -20 (bar)] TJ ET")
    assert(PdfText.extractText(pdf) == "foobar")
    val pdf2 = rawPdf("BT [(foo) -250 (bar)] TJ ET")
    assert(PdfText.extractText(pdf2) == "foo bar")
  }

  test("hex strings decode (odd digit padded)") {
    val pdf = rawPdf("BT <48656C6C6F> Tj ET")
    assert(PdfText.extractText(pdf) == "Hello")
    val odd = rawPdf("BT <48656C6C6F2> Tj ET") // trailing '2' → 0x20
    assert(PdfText.extractText(odd) == "Hello ")
  }

  test("octal and named escapes in literal strings") {
    val pdf = rawPdf("BT (A\\101\\12B\\tC\\)D) Tj ET")
    // \101 = 'A', \12 = LF, \t tab, \) paren
    assert(PdfText.extractText(pdf) == "AA\nB\tC)D")
  }

  test("line continuation backslash-EOL is dropped") {
    val pdf = rawPdf("BT (con\\\ntinued) Tj ET")
    assert(PdfText.extractText(pdf) == "continued")
  }

  test("Tm vertical move starts a new line; comments are skipped") {
    val pdf = rawPdf(
      "BT % a comment\n(first) Tj 1 0 0 1 72 700 Tm (second) Tj ET")
    assert(PdfText.extractText(pdf) == "first\nsecond")
  }

  test("positioning before any show creates no ghost lines") {
    val pdf = rawPdf("BT 72 720 Td 0 -14 Td 14 TL T* (only) Tj ET")
    assert(PdfText.extractText(pdf) == "only")
  }

  test("layout spans carry text positions") {
    val pdf = rawPdf("BT 72 720 Td (a) Tj 10 -14 Td (b) Tj ET")
    val spans = PdfText.extractSpans(pdf)
    assert(spans.map(_.text) == Seq("a", "b"))
    assert(spans(0).x == 72.0 && spans(0).y == 720.0)
    assert(spans(1).x == 82.0 && spans(1).y == 706.0)
  }

  test("binary streams containing 'endstream' bytes are sized by /Length") {
    // a non-text stream whose body contains the literal token, followed by
    // a real text stream — a naive endstream scan would truncate and lose it
    val junk = "xxendstreamxx"
    val text = "BT (safe) Tj ET"
    val a = s"%PDF-1.4\n1 0 obj\n<< /Length ${junk.length} >>\nstream\n$junk\nendstream\nendobj\n"
    val b = s"2 0 obj\n<< /Length ${text.length} >>\nstream\n$text\nendstream\nendobj\n%%EOF\n"
    val pdf = (a + b).getBytes(ISO_8859_1)
    assert(PdfText.extractText(pdf) == "safe")
  }

  test("indirect /Length reference falls back to endstream scan") {
    val text = "BT (fallback) Tj ET"
    val pdf = (s"%PDF-1.4\n1 0 obj\n<< /Length 8 0 R >>\nstream\n$text\nendstream\n" +
      "endobj\n%%EOF\n").getBytes(ISO_8859_1)
    assert(PdfText.extractText(pdf) == "fallback")
  }

  test("stream dict with a NESTED dict (/DecodeParms) still finds /Length and /FlateDecode") {
    // real crawl PDFs carry predictor params as a nested dict; the dict
    // window must start at the OUTERMOST '<<' (balanced scan), else the
    // top-level /Length and /FlateDecode are missed and the stream is
    // never inflated
    val raw = "BT 12 TL (nested) Tj ET".getBytes(ISO_8859_1)
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = d.deflate(buf); d.end()
    val c = java.util.Arrays.copyOf(buf, n)
    val head = s"%PDF-1.4\n1 0 obj\n<< /Length ${c.length} /Filter /FlateDecode " +
      "/DecodeParms << /Predictor 1 /Columns 4 >> >>\nstream\n"
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.getBytes(ISO_8859_1))
    out.write(c)
    out.write("\nendstream\nendobj\n%%EOF\n".getBytes(ISO_8859_1))
    assert(PdfText.extractText(out.toByteArray) == "nested")
  }

  test("real-world layout: PDF 1.5 predictor-compressed xref stream with DecodeParms") {
    // generated by the INDEPENDENT Python tool (tools/gen_pdf_fixture.py):
    // no classic xref table — a /Type /XRef stream under FlateDecode with
    // /Predictor 12 /Columns 7, the layout mainstream writers emit. The
    // scanner design (find content streams, ignore the xref) must extract
    // the page text AND take nothing from the xref stream's binary payload.
    val pdf = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/tools/fixtures/predictor_xref.pdf"))
    assert(PdfText.extractText(pdf) ==
      "Predictor xref fixture\nDecodeParms survive")
  }

  test("corrupt flate payload yields empty text, no throw") {
    val body = "not actually deflated"
    val pdf = (s"%PDF-1.4\n1 0 obj\n<< /Length ${body.length} /Filter /FlateDecode >>\n" +
      s"stream\n$body\nendstream\nendobj\n%%EOF\n").getBytes(ISO_8859_1)
    assert(PdfText.extractText(pdf) == "")
  }

  test("readDir: directory of PDFs → (path, pdf_text) table") {
    val dir = java.nio.file.Files.createTempDirectory("pdfsrc").toFile
    try {
      Seq("alpha one", "beta two", "gamma three").zipWithIndex.foreach {
        case (t, i) =>
          java.nio.file.Files.write(
            new java.io.File(dir, s"doc$i.pdf").toPath,
            PdfText.synthesize(Seq(s"T$i", t)))
      }
      java.nio.file.Files.write( // non-pdf noise must be ignored
        new java.io.File(dir, "notes.txt").toPath, "x".getBytes(ISO_8859_1))
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]").config("spark.sql.shuffle.partitions", 2)
        .config("spark.ui.enabled", false).getOrCreate()
      val rows = PdfText.readDir(spark, dir.getAbsolutePath)
        .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
      assert(rows.length == 3)
      assert(rows.map(_._2).toSeq ==
        Seq("T0\nalpha one", "T1\nbeta two", "T2\ngamma three"))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("synthesized file is structurally sane (header, xref, EOF)") {
    val pdf = new String(PdfText.synthesize(Seq("x")), ISO_8859_1)
    assert(pdf.startsWith("%PDF-1.4"))
    assert(pdf.contains("/Filter /FlateDecode"))
    assert(pdf.contains("xref"))
    assert(pdf.trim.endsWith("%%EOF"))
  }
}
