package graft.kernel

import scala.collection.mutable.ArrayBuffer

/** Parsing options (reference ParsingOptions, src/index.ts:13–19). When a
  * raw-text element's flag is false its body is skipped entirely (not even a
  * TextNode is kept); there is no `noscript` flag, so noscript bodies are
  * always dropped (reference `options[match[2]]` quirk, src/index.ts:940).
  */
final case class ParseOptions(
    lowerCaseTagName: Boolean = false,
    script: Boolean = false,
    style: Boolean = false,
    pre: Boolean = false,
    comment: Boolean = false)

/** Single-pass tokenizer + stack-based tree builder cloning the semantics of
  * the reference's `kMarkupPattern` regex loop and `parse()`
  * (/root/reference/src/index.ts:833, 892–1028) — re-expressed as a
  * hand-written char scanner (no backtracking regex engine in the hot path).
  *
  * Tokenizer contract (verified against the JS regex semantics):
  *   - `<!--` … first `-->` is a comment token; an unterminated comment is
  *     NOT a token (the `<` becomes text and scanning resumes one char later,
  *     so markup inside it may still match).
  *   - a tag is `<` `/`? name attrs* `\s*` `/`? `>` with name =
  *     `[a-zA-Z][-.:0-9_a-zA-Z]*`; attrs are key(=value)? tokens or junk runs
  *     `[^<>/\s]+`; quoted values may contain `>` and `/>`; unquoted values
  *     accept `/` unless directly followed by `>`.
  *   - anything that fails to complete a tag at a `<` (doctype, PI, `a < b`)
  *     is text; the scan restarts at the next char, so a tag starting inside
  *     the failed region is still found.
  */
object HtmlParser {

  // parser void set — note: differs from the serializer set (has col/source,
  // lacks doctype) — src/index.ts:836–847
  private val voidElements: Set[String] =
    Set("area", "base", "br", "col", "hr", "img", "input", "link", "meta", "source")

  // implicit close-by-opening table (src/index.ts:848–878)
  private val closedByOpening: Map[String, Set[String]] = {
    val hs = Set("p", "h1", "h2", "h3", "h4", "h5", "h6")
    val tbl = Set("tr", "thead", "tbody", "tfoot")
    Map(
      "li" -> Set("li"),
      "p" -> hs,
      "b" -> Set("div"),
      "td" -> Set("td", "th"),
      "th" -> Set("td", "th"),
      "h1" -> hs, "h2" -> hs, "h3" -> hs, "h4" -> hs, "h5" -> hs, "h6" -> hs,
      "colgroup" -> tbl, "tr" -> tbl, "thead" -> tbl, "tbody" -> tbl,
      "tfoot" -> tbl,
      "ul" -> Set("ul", "ol"), "ol" -> Set("ol", "ul"),
      "aside" -> Set("aside"), "nav" -> Set("nav"), "form" -> Set("form"),
      "header" -> Set("header"), "footer" -> Set("footer"),
      "main" -> Set("main"))
  }

  // raw-text fast-path elements (src/index.ts:879–884)
  private val blockTextElements: Set[String] =
    Set("script", "noscript", "style", "pre")

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** One token from the scanner. For comments only start/end are meaningful. */
  private final class Token {
    var start: Int = 0
    var end: Int = 0
    var isComment: Boolean = false
    var closing: Boolean = false
    var tag: String = null
    var attrBlob: String = null
    var self: Boolean = false
  }

  /** Find the next markup token at or after `from`; null when none. */
  private def nextToken(data: String, from: Int, tok: Token): Token = {
    val n = data.length
    var i = data.indexOf('<', from)
    while (i >= 0 && i < n) {
      // comment alternative
      if (data.startsWith("<!--", i)) {
        val close = data.indexOf("-->", i + 4)
        if (close >= 0) {
          tok.start = i; tok.end = close + 3; tok.isComment = true
          return tok
        }
        // unterminated: no token here; tag alternative can't start with '!'
      } else {
        // tag alternative
        var j = i + 1
        var closing = false
        if (j < n && data.charAt(j) == '/') { closing = true; j += 1 }
        if (j < n && isAsciiLetter(data.charAt(j))) {
          val nameStart = j
          j += 1
          while (j < n && AttrScanner.isNameChar(data.charAt(j))) j += 1
          val tag = data.substring(nameStart, j)
          // attribute blob
          val blobStart = j
          var blobEnd = j
          var k = j
          var done = false
          while (!done) {
            var m = k
            while (m < n && Js.isSpace(data.charAt(m))) m += 1
            if (m < n && isAsciiLetter(data.charAt(m))) {
              // key(=value)?
              var e = m + 1
              while (e < n && AttrScanner.isNameChar(data.charAt(e))) e += 1
              var v = e
              while (v < n && Js.isSpace(data.charAt(v))) v += 1
              if (v < n && data.charAt(v) == '=') {
                v += 1
                while (v < n && Js.isSpace(data.charAt(v))) v += 1
                if (v < n && (data.charAt(v) == '"' || data.charAt(v) == '\'')) {
                  val q = data.charAt(v)
                  val close = data.indexOf(q, v + 1)
                  if (close >= 0) k = close + 1
                  else k = e // unterminated quoted value → attr is key-only
                } else {
                  // bare value: (?:\/(?!>)|[^\s"'<>/])+
                  var b = v
                  var stop = false
                  while (b < n && !stop) {
                    val c = data.charAt(b)
                    if (c == '/') {
                      if (b + 1 < n && data.charAt(b + 1) == '>') stop = true
                      else b += 1
                    } else if (c == '<' || c == '>' || c == '"' || c == '\'' ||
                        Js.isSpace(c)) stop = true
                    else b += 1
                  }
                  if (b > v) k = b else k = e // no value chars → key-only
                }
              } else k = e
              blobEnd = k
            } else if (m < n && {
                val c = data.charAt(m)
                c != '<' && c != '/' && c != '>' && !Js.isSpace(c)
              }) {
              // junk token [^<>/\s]+
              var e = m + 1
              while (e < n && {
                  val c = data.charAt(e)
                  c != '<' && c != '/' && c != '>' && !Js.isSpace(c)
                }) e += 1
              k = e
              blobEnd = k
            } else done = true
          }
          // trailing \s* (/?) >
          var m = k
          while (m < n && Js.isSpace(data.charAt(m))) m += 1
          var self = false
          var ok = false
          var end = m
          if (m < n && data.charAt(m) == '/' && m + 1 < n && data.charAt(m + 1) == '>') {
            self = true; ok = true; end = m + 2
          } else if (m < n && data.charAt(m) == '>') {
            ok = true; end = m + 1
          }
          if (ok) {
            tok.start = i; tok.end = end; tok.isComment = false
            tok.closing = closing; tok.tag = tag
            tok.attrBlob = data.substring(blobStart, blobEnd)
            tok.self = self
            return tok
          }
        }
      }
      // no token at this '<' → resume scanning one char later
      i = data.indexOf('<', i + 1)
    }
    null
  }

  /** Parse an HTML document; returns the fictive root (tagName = "") with
    * `valid` set. Clones reference `parse()` exactly, including the
    * malformed-HTML repair pass.
    */
  def parse(data: String, options: ParseOptions = ParseOptions()): Element = {
    val root = new Element("", "")
    var currentParent: Element = root
    val stack = ArrayBuffer[Element](root)
    var lastTextPos = 0
    var pos = 0
    val n = data.length
    val tok = new Token
    var running = true

    while (running && pos <= n) {
      val t = nextToken(data, pos, tok)
      if (t == null) running = false
      else {
        if (t.start > lastTextPos)
          currentParent.appendChild(new TextNode(data.substring(lastTextPos, t.start)))
        lastTextPos = t.end
        pos = t.end

        if (t.isComment) {
          if (options.comment) {
            val value = data.substring(t.start + 4, t.end - 3)
            currentParent.appendChild(new CommentNode(value))
          }
        } else {
          var tag = t.tag
          if (options.lowerCaseTagName) tag = tag.toLowerCase
          var closing = t.closing

          if (!closing) {
            // implicit close by opening (skipped for explicit self-close)
            if (!t.self) {
              closedByOpening.get(currentParent.tagName) match {
                case Some(set) if set.contains(tag) =>
                  stack.remove(stack.length - 1)
                  currentParent =
                    if (stack.nonEmpty) stack.last else root
                case _ =>
              }
            }
            val el = new Element(tag, Js.trim(t.attrBlob))
            currentParent.appendChild(el)
            currentParent = el
            stack += el

            if (blockTextElements.contains(tag)) {
              // raw-text fast path: jump to the literal close tag
              val closeMarkup = "</" + tag + ">"
              val idx = data.indexOf(closeMarkup, t.end)
              val keep = tag match {
                case "script" => options.script
                case "style" => options.style
                case "pre" => options.pre
                case _ => false // no noscript option in the reference
              }
              if (keep) {
                val text =
                  if (idx == -1) data.substring(t.end)
                  else data.substring(t.end, idx)
                if (text.nonEmpty) currentParent.appendChild(new TextNode(text))
              }
              if (idx == -1) {
                // unterminated raw text: consume to EOF (element stays open)
                lastTextPos = n + 1
                pos = n + 1
              } else {
                lastTextPos = idx + closeMarkup.length
                pos = lastTextPos
                closing = true
              }
            }
          }

          // self-closing / explicit closing / void handling
          val closingTag = tag
          if (closing || t.self || voidElements.contains(closingTag)) {
            val isClosingTag = closing
            val isVoidTag = voidElements.contains(closingTag)
            if (!(isClosingTag && isVoidTag)) { // stray </br> etc. ignored
              var loop = true
              while (loop) {
                if (currentParent.tagName == closingTag) {
                  stack.remove(stack.length - 1)
                  currentParent = if (stack.nonEmpty) stack.last else root
                  loop = false
                } else if (stack.length > 1) {
                  // close unclosed child tags on the way (<a><b>x</a>)
                  stack.remove(stack.length - 1)
                  currentParent = if (stack.nonEmpty) stack.last else root
                } else loop = false
              }
            }
          }
        }
      }
    }

    // trailing text goes to the ROOT (not currentParent) — src/index.ts:997
    if (lastTextPos < n)
      root.appendChild(new TextNode(data.substring(lastTextPos)))

    // malformed-HTML repair (src/index.ts:1000–1026)
    root.valid = stack.length == 1
    while (stack.length > 1) {
      val last = stack.remove(stack.length - 1)
      val oneBefore = if (stack.nonEmpty) stack.last else root
      if (last.parentNode != null && last.parentNode.parentNode != null) {
        if ((last.parentNode eq oneBefore) && last.tagName == oneBefore.tagName) {
          // pair error <h3><h3> → <h3></h3>: reattach children to grandparent
          val grand = oneBefore.parentNode
          oneBefore.removeChild(last)
          last.childNodes.toArray.foreach(grand.appendChild(_))
          if (stack.nonEmpty) stack.remove(stack.length - 1)
        } else {
          // single error <div><h3></div>: drop the element, keep its children
          oneBefore.removeChild(last)
          last.childNodes.toArray.foreach(oneBefore.appendChild(_))
        }
      }
      // leftover at depth < 2: skip
    }
    root
  }
}
