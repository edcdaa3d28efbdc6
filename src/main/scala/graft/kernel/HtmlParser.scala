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

  // implicit close-by-opening table (src/index.ts:848–878) — a
  // java.util.HashMap so the per-element-open lookup returns null instead
  // of allocating an Option (this lookup runs once per opened element)
  private val closedByOpening: java.util.HashMap[String, Set[String]] = {
    val hs = Set("p", "h1", "h2", "h3", "h4", "h5", "h6")
    val tbl = Set("tr", "thead", "tbody", "tfoot")
    val m = new java.util.HashMap[String, Set[String]]
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
      "main" -> Set("main")).foreach { case (k, v) => m.put(k, v) }
    m
  }

  // raw-text fast-path elements (src/index.ts:879–884)
  private val blockTextElements: Set[String] =
    Set("script", "noscript", "style", "pre")

  /** The reference's lookup tables are plain JS object literals, so tag
    * names that collide with Object.prototype members are TRUTHY in every
    * `table[tag]` check (and in `options[tag]`!). Node-verified:
    * `<toString>x</toString>` keeps its raw text (options.toString is the
    * inherited function), is treated as void (stray-closer ignored) yet
    * never popped → stays open; `<li><toString>` implicit-closes the li.
    * Only names matching the tag grammar (start with a letter) can occur.
    */
  private def jsProtoKeys: Set[String] = Js.protoKeys

  // approximate truthy props when the IMPLICIT-CLOSE parent is itself a
  // proto key (the table value is then an inherited Function object)
  private val jsFunctionProtoKeys: Set[String] =
    jsProtoKeys ++ Set("call", "apply", "bind", "name")

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** Zero-allocation interning of hot tag names: the scanner sees the same
    * few dozen lowercase tags at ~2 substrings per element (open + close),
    * which at 6M docs/s × ~10 elements/doc is the single largest string-
    * allocation source in the kernel (BENCH.md §2: the 32-thread bend is
    * allocation-bandwidth). Lookup is (length, first char) → candidate
    * list, compared in place with regionMatches — uppercase or unusual
    * tags fall back to substring, so semantics are unchanged (tag case is
    * preserved either way).
    */
  private val hotTagLookup: Array[Array[Array[String]]] = {
    val hot = Array(
      "a", "b", "i", "p", "q", "s", "u",
      "br", "dd", "dl", "dt", "em", "h1", "h2", "h3", "h4", "h5", "h6",
      "hr", "li", "ol", "rp", "rt", "td", "th", "tr", "ul",
      "col", "dfn", "dir", "div", "img", "ins", "kbd", "loc", "map", "nav",
      "pre", "rss", "sub", "sup", "url", "var", "wbr",
      "area", "base", "body", "cite", "code", "feed", "form", "head",
      "html", "item", "link", "main", "mark", "meta", "span", "time",
      "aside", "audio", "entry", "input", "label", "small", "style",
      "table", "tbody", "tfoot", "thead", "title", "video",
      "button", "canvas", "figure", "footer", "header", "iframe", "legend",
      "object", "option", "script", "select", "source", "strong",
      "address", "article", "caption", "channel", "details", "pubDate",
      "section", "summary")
    val table = Array.fill(9)(new Array[Array[String]](26))
    hot.groupBy(t => (t.length, t.charAt(0))).foreach { case ((len, c0), ts) =>
      if (len <= 8 && c0 >= 'a' && c0 <= 'z') table(len)(c0 - 'a') = ts
    }
    table
  }

  private def internTag(data: String, start: Int, end: Int): String = {
    val len = end - start
    if (len <= 8) {
      val c0 = data.charAt(start)
      if (c0 >= 'a' && c0 <= 'z') {
        val cands = hotTagLookup(len)(c0 - 'a')
        if (cands != null) {
          var i = 0
          while (i < cands.length) {
            val cand = cands(i)
            if (data.regionMatches(start, cand, 0, len)) return cand
            i += 1
          }
        }
      }
    }
    data.substring(start, end)
  }

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

  private final class TagTail {
    var end: Int = 0
    var blobEnd: Int = 0
    var self: Boolean = false
    // reusable DFS scratch (one instance per parse, not per token) — LAZY:
    // real-world pages take the allocation-free fast tag tail ~always, so
    // the common parse never pays for the two DFS buffers
    lazy val fpos = new ArrayBuffer[Int](8)
    lazy val fchoice = new ArrayBuffer[Int](8)
  }

  private def isJunkChar(c: Char): Boolean =
    c != '<' && c != '>' && c != '/' && !Js.isSpace(c)

  /** Match the post-tag-name region `((\s*ATTR)*)\s*(\/?)>` with the same
    * backtracking choices as the reference regex (kMarkupPattern) — a greedy
    * one-pass scan is NOT equivalent: e.g. in `<tbody novalue= href="a//b">`
    * the regex retries `novalue` as value-less, eats `=` as a junk token,
    * and matches `href="a//b"` as a quoted attr that may jump `/` and `>`.
    *
    * DFS with a failed-position memo; choices per position in regex
    * alternation/backtracking order:
    *   0. key with full greedy value
    *   1. key with shortened bare value exposing a trailing `key2=` right
    *      before a quote — the only shortening that can reach new positions,
    *      because quoted values are the only token that jumps the stopper
    *      chars (`<a p=ab="x<y">` matches via value `a` + `b="x<y"`)
    *   2. key without value
    *   3. full greedy junk run
    *   4. junk shortened to expose an internal `key=` directly before a
    *      quote char inside the run (`<a ~x="p<q">`)
    *   5. stop the loop and close the tag
    */
  /** Allocation-free fast path for the overwhelmingly common tag tail
    * `(\s* key (\s*=\s* "quoted")? )* \s* /? >` — keys and QUOTED values
    * only. On this strict subset the DFS is deterministic (stage 0 or 2
    * succeeds immediately at every token and stage 5 closes the tag), so
    * the greedy scan is provably equivalent. ANY deviation — a bare value,
    * a junk char, an unterminated quote, running off the end — returns
    * `false` WITHOUT deciding the match, and the caller falls back to the
    * full backtracking DFS from the same start. Profiling: matchTagTail is
    * the parse hot spot (≈half of samples on tag-dense pages); real-world
    * attribute blobs hit this path ~always.
    */
  private def fastTagTail(data: String, start: Int, tail: TagTail): Boolean = {
    val n = data.length
    var p = start
    while (true) {
      var m = p
      while (m < n && Js.isSpace(data.charAt(m))) m += 1
      if (m >= n) return false
      val c = data.charAt(m)
      if (c == '>') {
        tail.end = m + 1; tail.self = false; tail.blobEnd = p
        return true
      }
      if (c == '/') {
        if (m + 1 < n && data.charAt(m + 1) == '>') {
          tail.end = m + 2; tail.self = true; tail.blobEnd = p
          return true
        }
        return false // '/' not closing the tag → junk territory, use the DFS
      }
      if (!isAsciiLetter(c)) return false
      var e = m + 1
      while (e < n && AttrScanner.isNameChar(data.charAt(e))) e += 1
      var v = e
      while (v < n && Js.isSpace(data.charAt(v))) v += 1
      if (v < n && data.charAt(v) == '=') {
        v += 1
        while (v < n && Js.isSpace(data.charAt(v))) v += 1
        if (v >= n) return false
        val q = data.charAt(v)
        if (q != '"' && q != '\'') return false // bare value → DFS
        val close = data.indexOf(q, v + 1)
        if (close < 0) return false
        p = close + 1
      } else {
        p = e // key-only attr; whatever follows is the next token
      }
    }
    false // unreachable
  }

  private def matchTagTail(data: String, start: Int, tail: TagTail): Boolean = {
    val n = data.length
    var failed: java.util.HashSet[Integer] = null
    def isFailed(p: Int) = failed != null && failed.contains(p)
    def isQuote(c: Char) = c == '"' || c == '\''

    def keyEnd(m: Int): Int = {
      var e = m + 1
      while (e < n && AttrScanner.isNameChar(data.charAt(e))) e += 1
      e
    }
    // maximal bare value end from v, or v if none
    def bareEnd(v: Int): Int = {
      var b = v
      var stop = false
      while (b < n && !stop) {
        val c = data.charAt(b)
        if (c == '/') {
          if (b + 1 < n && data.charAt(b + 1) == '>') stop = true else b += 1
        } else if (c == '<' || c == '>' || isQuote(c) || Js.isSpace(c)) stop = true
        else b += 1
      }
      b
    }
    // key starts (letters) of a `name=` suffix ending at `eq` (data(eq)=='='),
    // constrained to start strictly after `lo`; descending order
    def exposeStarts(lo: Int, eq: Int): Seq[Int] = {
      var s = eq - 1
      while (s > lo && AttrScanner.isNameChar(data.charAt(s - 1))) s -= 1
      (s until eq).reverseIterator.filter(i => isAsciiLetter(data.charAt(i)) && i > lo).toSeq
    }

    val fpos = tail.fpos
    val fchoice = tail.fchoice // encodes stage * 1024 + subIdx
    fpos.clear(); fchoice.clear()
    fpos += start; fchoice += 0
    while (fpos.nonEmpty) {
      val top = fpos.length - 1
      val p = fpos(top)
      val stage = fchoice(top) >> 10
      val sub = fchoice(top) & 1023
      var m = p
      while (m < n && Js.isSpace(data.charAt(m))) m += 1

      var pushTarget = -1
      var done = false
      (stage: @annotation.switch) match {
        case 0 => // key ( \s*=\s* full value )?
          fchoice(top) = 1 << 10
          if (m < n && isAsciiLetter(data.charAt(m))) {
            val e = keyEnd(m)
            var v = e
            while (v < n && Js.isSpace(data.charAt(v))) v += 1
            if (v < n && data.charAt(v) == '=') {
              v += 1
              while (v < n && Js.isSpace(data.charAt(v))) v += 1
              if (v < n && isQuote(data.charAt(v))) {
                val close = data.indexOf(data.charAt(v), v + 1)
                if (close >= 0) pushTarget = close + 1
              } else {
                val b = bareEnd(v)
                if (b > v) pushTarget = b
              }
            }
          }
        case 1 => // bare value shortened to expose trailing key= before quote
          var advanced = false
          if (m < n && isAsciiLetter(data.charAt(m))) {
            val e = keyEnd(m)
            var v = e
            while (v < n && Js.isSpace(data.charAt(v))) v += 1
            if (v < n && data.charAt(v) == '=') {
              v += 1
              while (v < n && Js.isSpace(data.charAt(v))) v += 1
              if (v < n && !isQuote(data.charAt(v))) {
                val b = bareEnd(v)
                if (b > v && b < n && isQuote(data.charAt(b)) &&
                    b - 1 > v && data.charAt(b - 1) == '=') {
                  val starts = exposeStarts(v, b - 1)
                  if (sub < starts.length) {
                    pushTarget = starts(sub)
                    fchoice(top) = (1 << 10) | (sub + 1)
                    advanced = true
                  }
                }
              }
            }
          }
          if (!advanced) fchoice(top) = 2 << 10
          if (pushTarget < 0 && !advanced) { /* fall through to next stage */ }
        case 2 => // key only (optional value group skipped)
          fchoice(top) = 3 << 10
          if (m < n && isAsciiLetter(data.charAt(m)))
            pushTarget = keyEnd(m)
        case 3 => // full junk run [^<>/\s]+
          fchoice(top) = 4 << 10
          if (m < n && isJunkChar(data.charAt(m))) {
            var e = m + 1
            while (e < n && isJunkChar(data.charAt(e))) e += 1
            pushTarget = e
          }
        case 4 => // junk shortened to expose internal key= before a quote
          var advanced = false
          if (m < n && isJunkChar(data.charAt(m))) {
            var e = m + 1
            while (e < n && isJunkChar(data.charAt(e))) e += 1
            // candidate key starts for every internal quote preceded by '=',
            // in descending order (largest junk prefix first)
            val cands = (m + 2 until e).reverseIterator
              .filter(q => isQuote(data.charAt(q)) && data.charAt(q - 1) == '=')
              .flatMap(q => exposeStarts(m, q - 1))
              .toSeq
            if (sub < cands.length) {
              pushTarget = cands(sub)
              fchoice(top) = (4 << 10) | (sub + 1)
              advanced = true
            }
          }
          if (!advanced) fchoice(top) = 5 << 10
        case 5 => // stop the attr loop: \s* (\/?) >
          if (m < n && data.charAt(m) == '/' && m + 1 < n && data.charAt(m + 1) == '>') {
            tail.end = m + 2; tail.self = true; tail.blobEnd = p
            return true
          } else if (m < n && data.charAt(m) == '>') {
            tail.end = m + 1; tail.self = false; tail.blobEnd = p
            return true
          }
          done = true
        case _ =>
          done = true
      }

      if (done) {
        // all choices exhausted at p
        if (failed == null) failed = new java.util.HashSet[Integer]
        failed.add(p)
        fpos.remove(top)
        fchoice.remove(top)
      } else if (pushTarget >= 0 && pushTarget != p && !isFailed(pushTarget)) {
        fpos += pushTarget
        fchoice += 0
      }
    }
    false
  }

  /** Find the next markup token at or after `from`; null when none. */
  private def nextToken(data: String, from: Int, tok: Token, tail: TagTail): Token = {
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
          if (fastTagTail(data, j, tail) || matchTagTail(data, j, tail)) {
            tok.start = i; tok.end = tail.end; tok.isComment = false
            tok.closing = closing; tok.tag = internTag(data, nameStart, j)
            // the attr blob is stored pre-trimmed (Js.trim bounds computed
            // in place) so Element construction costs ONE substring, not a
            // substring + a trim copy
            var bs = j
            var be = tail.blobEnd
            while (bs < be && Js.isSpace(data.charAt(bs))) bs += 1
            while (be > bs && Js.isSpace(data.charAt(be - 1))) be -= 1
            tok.attrBlob = if (bs == be) "" else data.substring(bs, be)
            tok.self = tail.self
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
  // NOTE on scratch reuse: thread-local reuse of the parse stack / token /
  // tag-tail across calls was measured and REVERTED — the long-lived
  // buffers receive young-gen reference stores on every push, and the
  // resulting card-table traffic (all threads hammering the same few card
  // bytes forever) more than doubled the 32-thread wall time. Per-call
  // young allocations stay inside each thread's TLAB and scale cleanly.
  def parse(data: String, options: ParseOptions = ParseOptions()): Element = {
    val root = new Element("", "")
    var currentParent: Element = root
    val stack = ArrayBuffer[Element](root)
    var lastTextPos = 0
    var pos = 0
    val n = data.length
    val tok = new Token
    val tail = new TagTail
    var running = true

    while (running && pos <= n) {
      val t = nextToken(data, pos, tok, tail)
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
              val set = closedByOpening.get(currentParent.tagName)
              val closes =
                if (set != null) set.contains(tag) || jsProtoKeys.contains(tag)
                else
                  jsProtoKeys.contains(currentParent.tagName) &&
                    jsFunctionProtoKeys.contains(tag)
              if (closes) {
                stack.remove(stack.length - 1)
                currentParent = if (stack.nonEmpty) stack.last else root
              }
            }
            val el = new Element(tag, t.attrBlob) // blob pre-trimmed by scanner
            currentParent.appendChild(el)
            currentParent = el
            stack += el

            if (blockTextElements.contains(tag) || jsProtoKeys.contains(tag)) {
              // raw-text fast path: jump to the literal close tag
              val closeMarkup = "</" + tag + ">"
              val idx = data.indexOf(closeMarkup, t.end)
              val keep = tag match {
                case "script" => options.script
                case "style" => options.style
                case "pre" => options.pre
                // options[tag] is proto-polluted too: {}.toString is truthy
                case t2 if jsProtoKeys.contains(t2) => true
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
          val isVoidTag = voidElements.contains(closingTag) ||
            jsProtoKeys.contains(closingTag)
          if (closing || t.self || isVoidTag) {
            val isClosingTag = closing
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
