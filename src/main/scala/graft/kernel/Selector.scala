package graft.kernel

import scala.collection.mutable.ArrayBuffer

/** One descendant part of a compiled selector:
  * `tag#id.c1.c2[a][b=v]` (reference parseCompleteSelector,
  * /root/reference/src/index.ts:666–685).
  */
final case class AttrPred(key: String, op: String, value: String) {
  /** Evaluated on the element's DECODED attributes (src/index.ts:743–777).
    * All comparisons case-sensitive. `!=` is true when the attr is absent.
    */
  def eval(el: Element): Boolean = {
    val v = el.attributes.get(key) // null when absent
    op match {
      case "=" => v != null && v == value
      case "!=" => v == null || v != value
      case "^=" => v != null && v.startsWith(value)
      case "$=" => v != null && v.endsWith(value)
      case "*=" => v != null && v.contains(value)
      case "|=" => v != null && (v == value || v.startsWith(value + "-"))
      case "~=" => v != null && Js.splitWs(v).contains(value)
      case _ => v != null // bare existence
    }
  }
}

final case class SelectorPart(
    tag: String,
    id: String,
    classes: List[String],
    attrs: List[AttrPred]) {
  def matches(el: Element): Boolean = {
    if (tag.nonEmpty && tag != "*" && el.tagName != tag) return false
    if (id.nonEmpty && el.id != id) return false
    var cs = classes
    while (cs.nonEmpty) {
      if (!el.classNames.contains(cs.head)) return false
      cs = cs.tail
    }
    var as = attrs
    while (as.nonEmpty) {
      if (!as.head.eval(el)) return false
      as = as.tail
    }
    true
  }
}

object Selector {

  private def isWordChar(c: Char): Boolean = // \w
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'
  private def isWordDash(c: Char): Boolean = isWordChar(c) || c == '-' // [\w-]
  private def isTagStart(c: Char): Boolean = // [a-zA-Z_*]
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_' || c == '*'
  private def isTagChar(c: Char): Boolean = // [\w:-]
    isWordChar(c) || c == ':' || c == '-'
  private def isAttrKeyChar(c: Char): Boolean = // [^\s~|^$*!=] (within [...])
    !Js.isSpace(c) && c != '~' && c != '|' && c != '^' && c != '$' &&
      c != '*' && c != '!' && c != '='

  /** Compile one comma-free selector into descendant parts, cloning the
    * reference's part regex semantics (src/index.ts:669): a part starts at ^
    * or after a whitespace run; attr `[...]` blocks may contain whitespace
    * (so `div[title="Hello World"] p` is two parts); unparseable suffixes are
    * discarded and scanning resumes at the next whitespace run.
    */
  def compile(selector: String): Array[SelectorPart] = {
    val parts = ArrayBuffer.empty[SelectorPart]
    val n = selector.length
    var i = 0
    var atPartStart = true // position 0 counts as a start without leading ws
    while (i < n) {
      if (!atPartStart) {
        // scan forward to the next whitespace run, then past it
        while (i < n && !Js.isSpace(selector.charAt(i))) i += 1
        while (i < n && Js.isSpace(selector.charAt(i))) i += 1
      }
      if (i < n) {
        val (part, end) = parsePartAt(selector, i)
        if (end > i) {
          if (part != null) parts += part
          i = end
        }
        atPartStart = false
      }
    }
    parts.toArray
  }

  /** Parse one selector part starting exactly at `i`; returns (part|null,
    * endPos). endPos == i means nothing matched at this position.
    */
  private def parsePartAt(s: String, start: Int): (SelectorPart, Int) = {
    val n = s.length
    var i = start
    var tag = ""
    var id = ""
    var classes = List.empty[String]
    var attrs = List.empty[AttrPred]
    // tag: [a-zA-Z_*][\w:-]*
    if (i < n && isTagStart(s.charAt(i))) {
      var j = i + 1
      while (j < n && isTagChar(s.charAt(j))) j += 1
      tag = s.substring(i, j)
      i = j
    }
    // #id ([\w-]+, at least one char)
    var halted = false
    if (!halted && i < n && s.charAt(i) == '#') {
      var j = i + 1
      while (j < n && isWordDash(s.charAt(j))) j += 1
      if (j > i + 1) { id = s.substring(i + 1, j); i = j }
      else halted = true
    }
    // .c1.c2…
    if (!halted && i < n && s.charAt(i) == '.') {
      val cls = ArrayBuffer.empty[String]
      var k = i
      var more = true
      while (more && k < n && s.charAt(k) == '.') {
        var j = k + 1
        while (j < n && isWordDash(s.charAt(j))) j += 1
        if (j > k + 1) { cls += s.substring(k + 1, j); k = j }
        else more = false
      }
      if (cls.nonEmpty) { classes = cls.toList; i = k }
      else halted = true
    }
    // ([...])+ — the part regex captures the whole bracket REGION (blocks of
    // 1+ non-']' chars); the attr regex then runs over the region and may
    // merge across block boundaries (its key class includes '[' and ']'),
    // e.g. `[href][target=_blank]` compiles to ONE predicate with key
    // `href][target` — a pinned reference quirk
    val regionStart = i
    while (!halted && i < n && s.charAt(i) == '[') {
      val close = s.indexOf(']', i + 1)
      if (close > i + 1) i = close + 1
      else halted = true
    }
    if (i > regionStart)
      attrs = parseAttributes(s.substring(regionStart, i))
    if (i == start) (null, start)
    else (SelectorPart(tag, id, classes, attrs), i)
  }

  /** Reference parseAttributes regex over a whole bracket region
    * (src/index.ts:694): `\[([^\s~|^$*!=]+)(?:\s*(op)\s*(?:["']?([^"'\]]*)["']?)?)?\]`
    * global, with full backtracking — the greedy key class includes '[' and
    * ']', so adjacent blocks can merge (pinned quirk). Backtracking order:
    * for each key length (longest first), try the op-group present (value
    * with optional quotes) then absent, then shrink the key; a position with
    * no parse advances one char.
    */
  private[kernel] def parseAttributes(s: String): List[AttrPred] = {
    val n = s.length
    val out = ArrayBuffer.empty[AttrPred]
    var pos = 0
    while (pos < n) {
      if (s.charAt(pos) != '[') pos += 1
      else {
        val keyStart = pos + 1
        var kMax = keyStart
        while (kMax < n && isAttrKeyChar(s.charAt(kMax))) kMax += 1
        var matched = false
        var e = kMax
        while (!matched && e > keyStart) {
          // variant A: op group present
          var v = e
          while (v < n && Js.isSpace(s.charAt(v))) v += 1
          var op: String = null
          if (v < n) {
            val c = s.charAt(v)
            if (c == '=') op = "="
            else if (v + 1 < n && s.charAt(v + 1) == '=' &&
                (c == '!' || c == '^' || c == '$' || c == '*' || c == '|' || c == '~'))
              op = s.substring(v, v + 2)
          }
          if (op != null) {
            var w = v + op.length
            while (w < n && Js.isSpace(s.charAt(w))) w += 1
            var x = w
            if (x < n && (s.charAt(x) == '"' || s.charAt(x) == '\'')) x += 1
            var y = x
            while (y < n && s.charAt(y) != '"' && s.charAt(y) != '\'' &&
              s.charAt(y) != ']') y += 1
            var z = y
            if (z < n && (s.charAt(z) == '"' || s.charAt(z) == '\'')) z += 1
            if (z < n && s.charAt(z) == ']') {
              out += AttrPred(s.substring(keyStart, e), op, s.substring(x, y))
              pos = z + 1; matched = true
            } else if (y < n && s.charAt(y) == ']') {
              // trailing quote absent
              out += AttrPred(s.substring(keyStart, e), op, s.substring(x, y))
              pos = y + 1; matched = true
            } else if (w < n && s.charAt(w) == ']') {
              // value group absent
              out += AttrPred(s.substring(keyStart, e), op, "")
              pos = w + 1; matched = true
            }
          }
          if (!matched) {
            // variant B: group absent → ']' right after the key
            if (e < n && s.charAt(e) == ']') {
              out += AttrPred(s.substring(keyStart, e), "", "")
              pos = e + 1; matched = true
            } else e -= 1 // shrink the greedy key
          }
        }
        if (!matched) pos += 1
      }
    }
    out.toList
  }
}

/** Stateful matcher over compiled selector parts — public API parity with the
  * reference Matcher (advance/rewind/matched/reset/level/clone,
  * src/index.ts:651–830).
  */
final class Matcher private (val parts: Array[SelectorPart], private var nextMatch: Int) {
  def this(selector: String) = this(Selector.compile(selector), 0)

  def advance(el: Element): Boolean = {
    if (nextMatch < parts.length && parts(nextMatch).matches(el)) {
      nextMatch += 1
      true
    } else false
  }
  def rewind(): Unit = nextMatch -= 1
  def matched: Boolean = nextMatch == parts.length
  def reset(): Unit = nextMatch = 0
  def level: Int = nextMatch
  def clone_(): Matcher = new Matcher(parts, nextMatch)
}

/** querySelector / querySelectorAll search (reference querySelectorImpl,
  * src/index.ts:400–476). The dual rewound/advanced exploration in all-mode —
  * including its non-document-order result concatenation and the Set dedup
  * for string selectors — is replicated exactly.
  */
object Query {

  /** Comma-union selector compiled once (one parts-array per comma part) —
    * the cacheable form for repeated execution over many documents.
    */
  def compileUnion(selector: String): Array[Array[SelectorPart]] =
    selector.split(',').iterator
      .filter(p => Js.trim(p).nonEmpty).map(p => Selector.compile(Js.trim(p)))
      .toArray

  def querySelectorAll(root: Element, selector: String): ArrayBuffer[Element] =
    querySelectorAll(root, compileUnion(selector))

  /** Union over pre-compiled comma parts, insertion-ordered identity dedup
    * (reference Set semantics, src/index.ts:408).
    */
  def querySelectorAll(root: Element, union: Array[Array[SelectorPart]]): ArrayBuffer[Element] = {
    val out = ArrayBuffer.empty[Element]
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Element, java.lang.Boolean])
    union.foreach { parts =>
      val res = ArrayBuffer.empty[Element]
      // memo = true: the Set dedup below keeps first occurrences anyway, so
      // skipping repeat (node, level) visits is output-identical and keeps
      // adversarially deep matching chains linear instead of O(depth²)
      exploreAll(root, parts, 0, res, memo = true)
      res.foreach { el => if (seen.add(el)) out += el }
    }
    out
  }

  /** First match over pre-compiled comma parts (part order beats document
    * order, src/index.ts:469–475).
    */
  def querySelector(root: Element, union: Array[Array[SelectorPart]]): Option[Element] = {
    var i = 0
    while (i < union.length) {
      val r = exploreOne(root, union(i), 0)
      if (r != null) return Some(r)
      i += 1
    }
    None
  }

  def querySelectorAll(root: Element, matcher: Matcher): ArrayBuffer[Element] = {
    matcher.reset()
    val res = ArrayBuffer.empty[Element]
    exploreAll(root, matcher.parts, 0, res)
    res
  }

  def querySelector(root: Element, selector: String): Option[Element] =
    querySelector(root, compileUnion(selector))

  def querySelector(root: Element, matcher: Matcher): Option[Element] = {
    matcher.reset()
    Option(exploreOne(root, matcher.parts, 0))
  }

  /** all-mode explore: on advance, descendants are explored twice — once with
    * the rewound level (same part may match deeper) and once with the
    * advanced level; rewound results precede advanced results
    * (src/index.ts:434–440). Heap-stacked DFS (adversarially deep documents
    * must not overflow the JVM stack); emission order is identical to the
    * reference's recursive concatenation order.
    */
  private def exploreAll(root: Element, parts: Array[SelectorPart], level0: Int,
      out: ArrayBuffer[Element], memo: Boolean = false): Unit = {
    // work stack of (node, level); LIFO pop order == recursive visit order.
    //
    // `memo = true` (the querySelectorAll union path) skips repeat visits of
    // the same (node, level) pair: on a deep chain of matching ancestors the
    // dual rewound/advanced fork re-visits (node, advancedLevel) once per
    // matching ancestor — O(depth²) visits and O(depth²) duplicate
    // emissions (OOM at 100k nesting). A repeat visit's entire subtree
    // exploration is identical to the first (same node, same level) and DFS
    // completes the first visit's subtree before popping the repeat, so
    // skipping changes neither the emitted SET nor first-occurrence ORDER —
    // and first-occurrence is exactly what the union path's Set dedup keeps
    // (reference src/index.ts:408). The raw-Matcher path keeps memo = false:
    // its duplicate emission order (ExtractSpec "3,2,3") is reference-pinned.
    val visited: java.util.IdentityHashMap[Element, Array[Boolean]] =
      if (memo) new java.util.IdentityHashMap() else null
    val nodes = new ArrayBuffer[Element](64)
    val levels = new ArrayBuffer[Int](64)
    nodes += root; levels += level0
    while (nodes.nonEmpty) {
      val node = nodes.remove(nodes.length - 1)
      val level = levels.remove(levels.length - 1)
      val skip = memo && {
        var seen = visited.get(node)
        if (seen == null) {
          seen = new Array[Boolean](parts.length + 1)
          visited.put(node, seen)
        }
        val repeat = seen(level)
        seen(level) = true
        repeat
      }
      if (!skip) {
      val advanced = node.tagName.nonEmpty && level < parts.length &&
        parts(level).matches(node)
      val kids = node.childNodes
      if (advanced && level + 1 == parts.length) {
        out += node
        var j = kids.length - 1
        while (j >= 0) {
          kids(j) match {
            case c: Element => nodes += c; levels += level
            case _ =>
          }
          j -= 1
        }
      } else if (advanced) {
        // advanced batch pushed first so the rewound batch is processed first
        var j = kids.length - 1
        while (j >= 0) {
          kids(j) match {
            case c: Element => nodes += c; levels += (level + 1)
            case _ =>
          }
          j -= 1
        }
        j = kids.length - 1
        while (j >= 0) {
          kids(j) match {
            case c: Element => nodes += c; levels += level
            case _ =>
          }
          j -= 1
        }
      } else {
        var j = kids.length - 1
        while (j >= 0) {
          kids(j) match {
            case c: Element => nodes += c; levels += level
            case _ =>
          }
          j -= 1
        }
      }
      }
    }
  }

  /** single-mode explore: no rewound exploration; children inherit the
    * (possibly advanced) level (src/index.ts:430, 443–450). Heap-stacked.
    */
  private def exploreOne(root: Element, parts: Array[SelectorPart], level0: Int): Element = {
    val nodes = new ArrayBuffer[Element](64)
    val levels = new ArrayBuffer[Int](64)
    nodes += root; levels += level0
    while (nodes.nonEmpty) {
      val node = nodes.remove(nodes.length - 1)
      val level = levels.remove(levels.length - 1)
      val advanced = node.tagName.nonEmpty && level < parts.length &&
        parts(level).matches(node)
      val newLevel = if (advanced) level + 1 else level
      if (advanced && newLevel == parts.length) return node
      val kids = node.childNodes
      var j = kids.length - 1
      while (j >= 0) {
        kids(j) match {
          case c: Element => nodes += c; levels += newLevel
          case _ =>
        }
        j -= 1
      }
    }
    null
  }
}
