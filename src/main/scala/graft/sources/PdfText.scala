package graft.sources

import scala.collection.mutable.ArrayBuffer
import java.util.zip.{Deflater, Inflater}

/** Minimal from-scratch PDF text/layout extraction — the north rule's
  * "PDF/layout parse" component, built on the public PDF 1.7 spec (ISO
  * 32000-1 §7.3 objects, §7.4.4 FlateDecode, §9.4 text objects). No PDF
  * library exists in this sandbox (and none is a dependency), so this is a
  * real, self-contained subset parser:
  *
  *   - object scan: every `stream … endstream` block in the file, sized by
  *     the dictionary's `/Length` when present (so binary payloads that
  *     happen to contain "endstream" can't truncate a read), inflated when
  *     the dictionary names `/FlateDecode` (zlib — `java.util.zip.Inflater`,
  *     which is exactly the format §7.4.4 specifies)
  *   - content interpreter: tokenizes the stream (literal strings with the
  *     full §7.3.4.2 escape set, hex strings, numbers, names, arrays,
  *     comments) and executes the §9.4.3 text-showing and §9.4.2
  *     text-positioning operators — Tj ' " TJ BT ET Td TD T* Tm TL
  *   - layout surface: every show op yields a Span(x, y, text) at the
  *     current text position; line structure falls out of the positioning
  *     ops (a vertical move starts a new line), not from guessing
  *
  * Out of scope (documented): font/encoding tables (strings are read as
  * UTF-8 bytes — the synthesis path writes them the same way), glyph-width
  * x-advances, inline images, xref/incremental updates (the scan finds
  * streams without needing the xref, which also makes it robust to PDFs
  * with broken xref tables — common in crawls).
  *
  * Scale shape: one PDF = one row; extraction is a pure per-row function
  * (map-only inside the same partition pass as everything else). The
  * synthesis side ([[synthesize]]) exists so the q44 roundtrip oracle can
  * gate the whole path the way q40 gates WARC: writer bugs, inflate bugs,
  * escape bugs, or interpreter bugs all break the hash.
  */
object PdfText {

  /** One text-show op at a text-space position (the layout surface). */
  final case class Span(x: Double, y: Double, text: String)

  // ---------------------------------------------------------------- reading

  private def indexOf(data: Array[Byte], target: String, from: Int): Int = {
    val t = target.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    var i = math.max(from, 0)
    val max = data.length - t.length
    while (i <= max) {
      var j = 0
      while (j < t.length && data(i + j) == t(j)) j += 1
      if (j == t.length) return i
      i += 1
    }
    -1
  }

  /** Inflate with a hard output cap (zip-bomb guard for crawl inputs). */
  private def inflate(data: Array[Byte], maxOut: Int = 1 << 26): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.min(data.length * 4, 1 << 16))
    val buf = new Array[Byte](1 << 14)
    try {
      while (!inf.finished() && !inf.needsInput() && out.size < maxOut) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return out.toByteArray // stuck: corrupt
        out.write(buf, 0, n)
      }
      out.toByteArray
    } catch {
      case _: java.util.zip.DataFormatException => out.toByteArray
    } finally inf.end()
  }

  /** Every stream block's decoded bytes, in file order. The preceding
    * dictionary window provides `/Length` (exact read) and `/Filter`;
    * without a parsable /Length the block ends at the next `endstream`.
    */
  private[sources] def streams(pdf: Array[Byte]): Seq[Array[Byte]] = {
    val out = ArrayBuffer.empty[Array[Byte]]
    var i = 0
    while (i >= 0 && i < pdf.length) {
      i = indexOf(pdf, "stream", i)
      if (i >= 0) {
        val isEnd = i >= 3 && pdf(i - 3) == 'e' && pdf(i - 2) == 'n' && pdf(i - 1) == 'd'
        if (isEnd) i += 6
        else {
          // dictionary window: back to the OUTERMOST "<<" by balancing
          // '>>'/'<<' pairs — a stream dict with a nested dict (e.g.
          // /DecodeParms << ... >>, common in predictor-compressed crawl
          // PDFs) must not make the window start at the inner dict, or
          // /Length and /FlateDecode at the top level are missed and the
          // stream silently mis-frames / never inflates
          val dictStart = {
            var j = i - 2
            var depth = 0
            var found = -1
            while (j >= 0 && found < 0) {
              if (pdf(j) == '>' && pdf(j + 1) == '>') { depth += 1; j -= 2 }
              else if (pdf(j) == '<' && pdf(j + 1) == '<') {
                depth -= 1
                if (depth <= 0) found = j else j -= 2
              }
              else j -= 1
            }
            found
          }
          val dict =
            if (dictStart >= 0)
              new String(pdf, dictStart, i - dictStart,
                java.nio.charset.StandardCharsets.ISO_8859_1)
            else ""
          // block starts after the EOL that must follow the `stream` keyword
          var s = i + 6
          if (s < pdf.length && pdf(s) == '\r') s += 1
          if (s < pdf.length && pdf(s) == '\n') s += 1
          val lenRe = """/Length\s+(\d+)(?!\s+0\s+R)""".r
          val end = lenRe.findFirstMatchIn(dict).map(_.group(1).toInt) match {
            case Some(len) if s + len <= pdf.length => s + len
            case _ =>
              val e = indexOf(pdf, "endstream", s)
              if (e >= 0) e else pdf.length
          }
          var block = java.util.Arrays.copyOfRange(pdf, s, math.max(end, s))
          if (dict.contains("/FlateDecode")) block = inflate(block)
          out += block
          i = end
        }
      }
    }
    out.toSeq
  }

  /** Decode a literal-string body (between the outer parens) per §7.3.4.2:
    * nested balanced parens, the 8 named escapes, 1–3-digit octal,
    * line-continuation backslash, and raw EOL normalized to \n. Returns the
    * raw BYTES (caller decides the text encoding).
    */
  private def literalString(data: Array[Byte], start: Int): (Array[Byte], Int) = {
    val out = new java.io.ByteArrayOutputStream(32)
    var i = start
    var depth = 1
    while (i < data.length && depth > 0) {
      val c = data(i)
      c match {
        case '\\' if i + 1 < data.length =>
          val e = data(i + 1)
          i += 2
          e match {
            case 'n' => out.write('\n')
            case 'r' => out.write('\r')
            case 't' => out.write('\t')
            case 'b' => out.write('\b')
            case 'f' => out.write('\f')
            case '(' => out.write('(')
            case ')' => out.write(')')
            case '\\' => out.write('\\')
            case '\r' => if (i < data.length && data(i) == '\n') i += 1 // continuation
            case '\n' => // continuation
            case d if d >= '0' && d <= '7' =>
              var v = d - '0'
              var k = 0
              while (k < 2 && i < data.length && data(i) >= '0' && data(i) <= '7') {
                v = v * 8 + (data(i) - '0'); i += 1; k += 1
              }
              out.write(v & 0xFF)
            case other => out.write(other) // unknown escape: the char itself
          }
        case '(' => depth += 1; out.write('('); i += 1
        case ')' =>
          depth -= 1
          if (depth > 0) out.write(')')
          i += 1
        case '\r' =>
          out.write('\n') // EOL normalization
          i += 1
          if (i < data.length && data(i) == '\n') i += 1
        case b => out.write(b); i += 1
      }
    }
    (out.toByteArray, i)
  }

  private def hexString(data: Array[Byte], start: Int): (Array[Byte], Int) = {
    val out = new java.io.ByteArrayOutputStream(16)
    var i = start
    var hi = -1
    while (i < data.length && data(i) != '>') {
      val c = data(i).toChar
      val v =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else -1
      if (v >= 0) {
        if (hi < 0) hi = v
        else { out.write(hi * 16 + v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi * 16) // odd count: final digit padded with 0
    ((out.toByteArray, math.min(i + 1, data.length)))
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0
  private def isDelim(b: Byte): Boolean =
    b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
      b == '{' || b == '}' || b == '/' || b == '%'

  private val ArrayMark = new AnyRef

  /** Interpret one content stream; show ops append to `spans`; positioning
    * ops drive the line model via `newline`.
    */
  private def interpret(data: Array[Byte],
      onShow: (Double, Double, String) => Unit, onNewline: () => Unit): Unit = {
    var i = 0
    val n = data.length
    val stack = ArrayBuffer.empty[Any]
    var lx = 0.0; var ly = 0.0 // text-line position
    var leading = 0.0

    def popNum(): Double = {
      var j = stack.length - 1
      while (j >= 0) {
        stack(j) match {
          case d: java.lang.Double => stack.remove(j); return d.doubleValue()
          case _ => j -= 1
        }
      }
      0.0
    }
    def popStr(): String = {
      var j = stack.length - 1
      while (j >= 0) {
        stack(j) match {
          case s: String => stack.remove(j); return s
          case _ => j -= 1
        }
      }
      ""
    }
    /** Elements above the most recent array mark (cleared). */
    def popArray(): Seq[Any] = {
      val mark = stack.lastIndexWhere(_.asInstanceOf[AnyRef] eq ArrayMark)
      if (mark < 0) { val all = stack.toSeq; stack.clear(); all }
      else {
        val elems = stack.slice(mark + 1, stack.length).toSeq
        stack.remove(mark, stack.length - mark)
        elems
      }
    }
    def show(s: String): Unit = onShow(lx, ly, s)
    def newline(): Unit = onNewline()

    while (i < n) {
      val b = data(i)
      if (isWs(b)) i += 1
      else if (b == '%') { while (i < n && data(i) != '\n' && data(i) != '\r') i += 1 }
      else if (b == '(') {
        val (bytes, next) = literalString(data, i + 1)
        stack += new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        i = next
      } else if (b == '<' && i + 1 < n && data(i + 1) == '<') {
        // dictionary: skip to the matching >>
        var depth = 1
        i += 2
        while (i + 1 < n && depth > 0) {
          if (data(i) == '<' && data(i + 1) == '<') { depth += 1; i += 2 }
          else if (data(i) == '>' && data(i + 1) == '>') { depth -= 1; i += 2 }
          else i += 1
        }
      } else if (b == '<') {
        val (bytes, next) = hexString(data, i + 1)
        stack += new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        i = next
      } else if (b == '[') { stack += ArrayMark; i += 1 }
      else if (b == ']') { i += 1 } // leave elements; TJ pops via popArray
      else if (b == '/') {
        i += 1
        val s0 = i
        while (i < n && !isWs(data(i)) && !isDelim(data(i))) i += 1
        stack += Symbol(new String(data, s0, i - s0,
          java.nio.charset.StandardCharsets.ISO_8859_1))
      } else if ((b >= '0' && b <= '9') || b == '+' || b == '-' || b == '.') {
        val s0 = i
        i += 1
        while (i < n && ((data(i) >= '0' && data(i) <= '9') || data(i) == '.')) i += 1
        val txt = new String(data, s0, i - s0, java.nio.charset.StandardCharsets.US_ASCII)
        stack += java.lang.Double.valueOf(
          try txt.toDouble catch { case _: NumberFormatException => 0.0 })
      } else {
        // operator token
        val s0 = i
        while (i < n && !isWs(data(i)) && !isDelim(data(i))) i += 1
        val op =
          if (i == s0) { i += 1; new String(data, s0, 1, java.nio.charset.StandardCharsets.ISO_8859_1) }
          else new String(data, s0, i - s0, java.nio.charset.StandardCharsets.ISO_8859_1)
        op match {
          case "BT" => lx = 0; ly = 0; leading = 0; stack.clear()
          case "ET" => stack.clear()
          case "Td" =>
            val ty = popNum(); val tx = popNum()
            lx += tx; ly += ty
            if (ty != 0) newline()
          case "TD" =>
            val ty = popNum(); val tx = popNum()
            leading = -ty
            lx += tx; ly += ty
            if (ty != 0) newline()
          case "T*" => ly -= leading; newline()
          case "TL" => leading = popNum()
          case "Tm" =>
            val f = popNum(); val e = popNum()
            popNum(); popNum(); popNum(); popNum() // a b c d ignored (no scaling model)
            if (f != ly) newline()
            lx = e; ly = f
          case "Tj" => show(popStr())
          case "'" => ly -= leading; newline(); show(popStr())
          case "\"" =>
            val s = popStr(); popNum(); popNum() // aw ac ignored
            ly -= leading; newline(); show(s)
          case "TJ" =>
            val elems = popArray()
            val sb = new java.lang.StringBuilder
            elems.foreach {
              case s: String => sb.append(s)
              case d: java.lang.Double =>
                // §9.4.3: negative adjustments move right-ward glyphs apart;
                // a gap wider than ~a third of an em is a word break
                if (d.doubleValue() <= -180.0) sb.append(' ')
              case _ =>
            }
            show(sb.toString)
          case _ => stack.clear() // any other operator consumes its operands
        }
      }
    }
  }

  /** All text spans (layout surface), file order. */
  def extractSpans(pdf: Array[Byte]): Seq[Span] = {
    val spans = ArrayBuffer.empty[Span]
    streams(pdf).foreach { s =>
      if (indexOf(s, "BT", 0) >= 0)
        interpret(s, (x, y, t) => spans += Span(x, y, t), () => ())
    }
    spans.toSeq
  }

  /** Plain-text extraction: show ops append to the current line; every
    * vertical positioning move flushes it. A line is emitted when ANY show
    * op targeted it (so deliberately empty lines survive), and never
    * otherwise (positioning before the first show doesn't create ghost
    * blank lines). Lines joined with \n.
    */
  def extractText(pdf: Array[Byte]): String = {
    val lines = ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder
    var shown = false
    def flush(): Unit = {
      if (shown) { lines += cur.toString; cur.setLength(0); shown = false }
      else cur.setLength(0)
    }
    streams(pdf).foreach { s =>
      if (indexOf(s, "BT", 0) >= 0)
        interpret(s, (_, _, t) => { cur.append(t); shown = true }, () => flush())
    }
    flush()
    lines.mkString("\n")
  }

  /** Directory of `.pdf` files → (path, pdf_text) — the PDF analog of
    * [[WarcSource.read]]. A PDF is a whole-file document (there is no
    * record stream to decode incrementally), so the binaryFile source's
    * content column is the right granule: Spark packs small files into
    * ~maxPartitionBytes tasks, and extraction is a pure per-row map.
    */
  def readDir(spark: org.apache.spark.sql.SparkSession,
      path: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, udf}
    val ext = udf { (pdf: Array[Byte]) => extractText(pdf) }
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.pdf")
      .load(path)
      .select(col("path"), ext(col("content")).as("pdf_text"))
  }

  // -------------------------------------------------------------- writing

  /** Escape a text line into literal-string BYTES (UTF-8 payload; the five
    * bytes that would break the string or be normalized on read are
    * escaped: backslash, parens, CR, LF).
    */
  private def escapeLiteral(s: String): Array[Byte] = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream(bytes.length + 8)
    bytes.foreach {
      case 0x5C => out.write('\\'); out.write('\\')
      case 0x28 => out.write('\\'); out.write('(')
      case 0x29 => out.write('\\'); out.write(')')
      case 0x0A => out.write('\\'); out.write('n')
      case 0x0D => out.write('\\'); out.write('r')
      case b => out.write(b)
    }
    out.toByteArray
  }

  /** One-page PDF whose content stream shows `lines` (first via Tj, the
    * rest as chunked TJ arrays — both show forms exercised on every
    * document), FlateDecoded by default. Valid per ISO 32000-1 (header,
    * catalog/pages/page/font objects, xref, trailer) so external tools can
    * open what the roundtrip gate reads back.
    */
  def synthesize(lines: Seq[String], flate: Boolean = true): Array[Byte] = {
    val content = {
      val sb = new java.io.ByteArrayOutputStream(256)
      def w(s: String): Unit =
        sb.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      w("BT\n/F1 12 Tf\n14 TL\n72 720 Td\n")
      lines.zipWithIndex.foreach { case (line, idx) =>
        if (idx > 0) w("T*\n")
        if (idx == 0) {
          w("("); sb.write(escapeLiteral(line)); w(") Tj\n")
        } else {
          // TJ with ~24-byte chunks and zero-width adjustments between them
          w("[")
          val chunks =
            if (line.isEmpty) Seq("")
            else line.grouped(24).toSeq
          chunks.zipWithIndex.foreach { case (c, j) =>
            if (j > 0) w(" -2 ") // tracking tweak, below the word-break bar
            w("("); sb.write(escapeLiteral(c)); w(")")
          }
          w("] TJ\n")
        }
      }
      w("ET\n")
      sb.toByteArray
    }
    val body =
      if (flate) {
        val d = new Deflater()
        d.setInput(content); d.finish()
        val out = new java.io.ByteArrayOutputStream(content.length / 2 + 16)
        val buf = new Array[Byte](1 << 14)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        d.end()
        out.toByteArray
      } else content

    val out = new java.io.ByteArrayOutputStream(body.length + 512)
    def w(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val offsets = ArrayBuffer.empty[Int]
    w("%PDF-1.4\n")
    offsets += out.size; w("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    offsets += out.size; w("2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n")
    offsets += out.size
    w("3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>\nendobj\n")
    offsets += out.size
    w(s"4 0 obj\n<< /Length ${body.length}" +
      (if (flate) " /Filter /FlateDecode" else "") + " >>\nstream\n")
    out.write(body)
    w("\nendstream\nendobj\n")
    offsets += out.size
    w("5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    val xref = out.size
    w(s"xref\n0 6\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$xref\n")
    w("%%EOF\n")
    out.toByteArray
  }
}
