package graft.kernel

import scala.collection.mutable.ArrayBuffer

/** Simplified-DOM node model cloning the semantics of the reference engine
  * (/root/reference/src/index.ts:24–642). One mutable pointer-linked tree per
  * document; trees live entirely inside a Spark partition (built and consumed
  * within `mapPartitions`) and are never shuffled or encoded.
  *
  * Fidelity notes (quirks pinned by the reference test suite — replicated,
  * not fixed):
  *   - `parentNode` is only ever set for elements; text/comment children keep
  *     a null parent (src/index.ts:483–489), so `remove()` no-ops for them
  *     and `innerHTML =` leaves old text children in place.
  *   - the serializer's self-closing set differs from the parser's void set
  *     (src/index.ts:281 vs 836–847).
  *   - `class=""` yields no classNames but decoded attributes contain "".
  */
sealed abstract class DomNode {
  /** 1 = element, 3 = text, 8 = comment (same values as the reference). */
  def nodeType: Int
  var parentNode: Element = null
  def rawText: String
  /** Entity-decoded text (reference `get text`, src/index.ts:37–39). */
  def text: String = Entities.decode(rawText)
  /** Serialize to HTML (reference `toString`). */
  def toHtml: String
  override def toString: String = toHtml
  /** Stable JSON string (reference `toJSON` shape). */
  def toJsonString: String

  /** Detach from parent if attached (no-op for text/comment — quirk). */
  def remove(): this.type = {
    if (parentNode != null) parentNode.removeChild(this)
    this
  }
}

final class TextNode(var value: String) extends DomNode {
  def nodeType: Int = 3
  def rawText: String = value
  /** `/^(\s|&nbsp;)*$/` (src/index.ts:83–85). */
  def isWhitespace: Boolean = Js.isWhitespaceOrNbsp(rawText)
  def toHtml: String = rawText
  def toJsonString: String =
    s"""{"type":"text","value":${JsonUtil.quote(value)}}"""
}

final class CommentNode(var value: String) extends DomNode {
  def nodeType: Int = 8
  def rawText: String = value
  def toHtml: String = s"<!--$value-->"
  def toJsonString: String =
    s"""{"type":"comment","value":${JsonUtil.quote(value)}}"""
}

object Element {
  /** Serializer self-closing set — note: differs from the parser's void set
    * (`doctype` extra; `col`/`source` missing) — src/index.ts:281.
    */
  private[kernel] val serializerSelfClosing: Set[String] =
    Set("img", "br", "hr", "area", "base", "input", "doctype", "link", "meta")

  /** structuredText block set — exactly div/p/li/td/section/br; ul/ol/table/tr
    * are deliberately absent (src/index.ts:122–133).
    */
  private[kernel] val structuredTextBlocks: Set[String] =
    Set("div", "p", "li", "td", "section", "br")

  /** 40-entry block-tag list for `isBlock` (src/index.ts:1030–1071). */
  val blockTags: Set[String] = Set(
    "html", "body", "address", "article", "aside", "blockquote", "canvas",
    "dd", "div", "dl", "dt", "fieldset", "figcaption", "figure", "footer",
    "form", "header", "hr", "li", "main", "nav", "noscript", "ol", "p",
    "pre", "section", "tfoot", "table", "tbody", "ul", "video", "th", "td",
    "tr", "h1", "h2", "h3", "h4", "h5", "h6")

  def isBlock(node: DomNode): Boolean = node match {
    case e: Element => e.tagName.nonEmpty && blockTags.contains(e.tagName.toLowerCase)
    case _ => false
  }

  private[kernel] val emptyClasses: Array[String] = Array.empty

  private final case class CloseTag(s: String)

  // NOTE: thread-local reuse of the structuredText frame stack was measured
  // and reverted — long-lived scratch turns every frame push into an
  // old-gen card-table write shared across threads (see the matching note
  // in HtmlParser.parse); per-call TLAB allocation scales better at 32
  // threads.

  private[kernel] def serializeNode(node: DomNode, sb: java.lang.StringBuilder): Unit =
    node match {
      case e: Element => serialize(e, sb)
      case t: TextNode => sb.append(t.value)
      case c: CommentNode => sb.append("<!--").append(c.value).append("-->")
    }

  /** Iterative serializer ≡ reference toString (src/index.ts:278–291). */
  private[kernel] def serialize(root: Element, sb: java.lang.StringBuilder): Unit = {
    val stack = new ArrayBuffer[AnyRef](32)
    stack += root
    while (stack.nonEmpty) {
      stack.remove(stack.length - 1) match {
        case CloseTag(s) => sb.append(s)
        case e: Element =>
          val tag = e.tagName
          if (tag.nonEmpty) {
            sb.append('<').append(tag)
            if (e.rawAttrs.nonEmpty) sb.append(' ').append(e.rawAttrs)
            if (serializerSelfClosing.contains(tag.toLowerCase)) sb.append(" />")
            else {
              sb.append('>')
              stack += CloseTag("</" + tag + ">")
              var j = e.childNodes.length - 1
              while (j >= 0) { stack += e.childNodes(j); j -= 1 }
            }
          } else {
            var j = e.childNodes.length - 1
            while (j >= 0) { stack += e.childNodes(j); j -= 1 }
          }
        case t: TextNode => sb.append(t.value)
        case c: CommentNode => sb.append("<!--").append(c.value).append("-->")
        case _ =>
      }
    }
  }
}

final class Element(var tagName: String, rawAttrsInit: String) extends DomNode {
  def nodeType: Int = 1

  /** Raw attribute string as written in the source tag (trimmed). */
  var rawAttrs: String = if (rawAttrsInit == null) "" else rawAttrsInit
  // small initial capacity: most elements have few children, and the parse
  // kernel is memory-bandwidth-bound at high core counts (BENCH.md)
  val childNodes: ArrayBuffer[DomNode] = new ArrayBuffer(2)

  /** Eagerly-extracted id/class shorthand (ctor mini-regex,
    * src/index.ts:183–193): only `id=`/`class=` keys preceded by start/space,
    * quoted values must be non-empty, exact-lowercase keys only.
    */
  var id: String = ""
  var classNames: Array[String] = Element.emptyClasses

  // lazy caches mirroring _attrs / _rawAttrs
  private var _attrs: java.util.LinkedHashMap[String, String] = null
  private var _rawAttrs: java.util.LinkedHashMap[String, String] = null

  /** parse() bolts `valid` onto the returned root (src/index.ts:893,1001). */
  var valid: Boolean = true

  AttrScanner.extractIdClass(this)

  // ---------------------------------------------------------------- children

  def appendChild[N <: DomNode](node: N): N = {
    childNodes += node
    node match { case e: Element => e.parentNode = this; case _ => }
    node
  }

  def prependChild[N <: DomNode](node: N): N = {
    childNodes.insert(0, node)
    node match { case e: Element => e.parentNode = this; case _ => }
    node
  }

  /** Identity-filter removal; unconditionally nulls the child's parent link
    * for elements (src/index.ts:199–204).
    */
  def removeChild(node: DomNode): Unit = {
    childNodes.filterInPlace(_ ne node)
    node match { case e: Element => e.parentNode = null; case _ => }
  }

  /** In-place replacement; does NOT set newNode.parentNode (quirk,
    * src/index.ts:210–216).
    */
  def exchangeChild(oldNode: DomNode, newNode: DomNode): Unit = {
    val idx = childNodes.indexWhere(_ eq oldNode)
    if (idx >= 0) {
      childNodes(idx) = newNode
      oldNode match { case e: Element => e.parentNode = null; case _ => }
    }
  }

  def firstChild: DomNode = if (childNodes.isEmpty) null else childNodes.head
  def lastChild: DomNode = if (childNodes.isEmpty) null else childNodes.last

  /** Element-only children (reference `get children`). */
  def children: ArrayBuffer[Element] =
    childNodes.collect { case e: Element => e }

  // ------------------------------------------------------------- extraction

  /** Concatenated raw text of the subtree — note comments contribute their
    * value (src/index.ts:109–111, 221–226). Iterative.
    */
  def rawText: String = {
    val sb = new java.lang.StringBuilder
    val stack = new ArrayBuffer[DomNode](16)
    var i = childNodes.length - 1
    while (i >= 0) { stack += childNodes(i); i -= 1 }
    while (stack.nonEmpty) {
      val node = stack.remove(stack.length - 1)
      node match {
        case e: Element =>
          var j = e.childNodes.length - 1
          while (j >= 0) { stack += e.childNodes(j); j -= 1 }
        case t: TextNode => sb.append(t.value)
        case c: CommentNode => sb.append(c.value)
      }
    }
    sb.toString
  }

  /** Block-aware main-content extraction (src/index.ts:231–268). Iterative
    * DFS with explicit block-exit frames; byte-identical to the reference.
    */
  def structuredText: String = {
    val blocks = ArrayBuffer.empty[Block]
    var currentBlock = new Block
    blocks += currentBlock
    // frames: Right(node) = visit, Left(()) = block-exit flush
    val stack = new ArrayBuffer[AnyRef](32)
    stack += this
    while (stack.nonEmpty) {
      stack.remove(stack.length - 1) match {
        case BlockExit =>
          if (!currentBlock.isEmpty) {
            currentBlock = new Block
            blocks += currentBlock
          }
        case e: Element =>
          // kBlockElements is a JS object literal in the reference, so
          // Object.prototype member names are truthy here too
          val isBlk = e.tagName.nonEmpty &&
            (Element.structuredTextBlocks.contains(e.tagName) ||
              Js.protoKeys.contains(e.tagName))
          if (isBlk) {
            if (!currentBlock.isEmpty) {
              currentBlock = new Block
              blocks += currentBlock
            }
            stack += BlockExit
          }
          var j = e.childNodes.length - 1
          while (j >= 0) { stack += e.childNodes(j); j -= 1 }
        case t: TextNode =>
          if (t.isWhitespace) currentBlock.prependWhitespace = true
          else {
            var txt = t.text
            if (currentBlock.prependWhitespace) {
              txt = " " + txt
              currentBlock.prependWhitespace = false
            }
            currentBlock.add(txt)
          }
        case _ => // comments ignored
      }
    }
    val sb = new java.lang.StringBuilder
    var first = true
    blocks.foreach { b =>
      if (!first) sb.append('\n')
      first = false
      sb.append(Js.collapseWs2(Js.trim(b.joined)))
    }
    Js.trimRight(sb.toString)
  }

  /** Indented `tag#id.classes` outline; `#text` for non-whitespace text
    * (src/index.ts:347–371). Iterative.
    *
    * TOTAL-OUTPUT bound: the literal format ("  " per level per line)
    * makes output O(nodes × depth); with the 8192-level indent fidelity
    * window a parseable ~100k-deep pathological document would otherwise
    * build a multi-GB string. Output is capped at 2^29 chars — V8's max
    * string length (≈2^29 − 24), so every structure the reference could
    * physically RETURN (its `dfs` join would RangeError above that) is
    * still byte-identical, and anything larger truncates with an explicit
    * marker line instead of driving the JVM toward a 2^31 array limit.
    * The cap is APPROXIMATE: the budget is checked before each append, so
    * the result can exceed it by up to one line (~16 KB at max indent).
    */
  def structure: String = structureCapped(1L << 29)

  private[kernel] def structureCapped(maxChars: Long): String = {
    val res = ArrayBuffer.empty[String]
    var total = 0L
    // stack entries: (Element | "#text" marker, indention)
    val stack = new ArrayBuffer[(AnyRef, Int)](32)
    stack += ((this, 0))
    while (stack.nonEmpty && total <= maxChars) {
      val (item, ind) = stack.remove(stack.length - 1)
      // indentation is capped at 8192 levels: the literal format ("  " per
      // level per line) makes the OUTPUT quadratic in depth — a 100k-deep
      // page would produce a 10^10-char string (OOM). The reference's
      // structure getter (src/index.ts:347) recurses one `dfs` frame per
      // level, and Node's default ~1 MB value stack overflows a frame of
      // that shape near 10^4 levels — so every depth the reference can
      // actually serve without RangeError (real pages are <100 deep) is
      // byte-identical, and the cap only diverges at depths where the
      // reference is at/over its own stack limit — same class as
      // divergence #2 in COVERAGE.md.
      val indStr = "  " * math.min(ind, 8192)
      item match {
        case node: Element =>
          val idStr = if (node.id.nonEmpty) "#" + node.id else ""
          val classStr =
            if (node.classNames.nonEmpty) "." + node.classNames.mkString(".") else ""
          res += indStr + node.tagName + idStr + classStr
          total += indStr.length + node.tagName.length + idStr.length +
            classStr.length + 1
          var j = node.childNodes.length - 1
          while (j >= 0) {
            node.childNodes(j) match {
              case e: Element => stack += ((e, ind + 1))
              case t: TextNode => if (!t.isWhitespace) stack += (("#text", ind + 1))
              case _ =>
            }
            j -= 1
          }
        case _ =>
          res += indStr + "#text"
          total += indStr.length + 6
      }
    }
    // marker ONLY when content was actually skipped — total can trip the
    // cap on the final node with the stack already drained, and a complete
    // output must never carry a lying truncation line
    if (stack.nonEmpty) res += "[structure truncated: output exceeds JS string limit]"
    res.mkString("\n")
  }

  /** Drop whitespace-only text children, trim others, recurse into elements,
    * keep comments (src/index.ts:377–392). Iterative.
    */
  def removeWhitespace(): this.type = {
    val stack = new ArrayBuffer[Element](16)
    stack += this
    while (stack.nonEmpty) {
      val el = stack.remove(stack.length - 1)
      el.childNodes.filterInPlace {
        case t: TextNode =>
          if (t.isWhitespace) false
          else { t.value = Js.trim(t.rawText); true }
        case e: Element => stack += e; true
        case _ => true
      }
    }
    this
  }

  /** Truncate at the first regex hit within a text/comment child and drop all
    * following siblings; recurse into element children (src/index.ts:327–342).
    */
  def trimRight(pattern: scala.util.matching.Regex): this.type = {
    var i = 0
    while (i < childNodes.length) {
      childNodes(i) match {
        case e: Element => e.trimRight(pattern)
        case other =>
          val idx = pattern.findFirstMatchIn(other.rawText).map(_.start).getOrElse(-1)
          if (idx > -1) {
            other match {
              case t: TextNode => t.value = t.rawText.substring(0, idx)
              case c: CommentNode => c.value = c.rawText.substring(0, idx)
              case _ =>
            }
            childNodes.takeInPlace(i + 1)
          }
      }
      i += 1
    }
    this
  }

  // ------------------------------------------------------------ serialization

  def toHtml: String = {
    val sb = new java.lang.StringBuilder(64)
    Element.serialize(this, sb)
    sb.toString
  }

  def innerHTML: String = {
    val sb = new java.lang.StringBuilder(64)
    childNodes.foreach(c => Element.serializeNode(c, sb))
    sb.toString
  }

  /** Reparse + remove old children + append new. Because `remove()` no-ops
    * for text/comment, old text children survive (quirk, src/index.ts:300–304).
    */
  def innerHTML_=(content: String): Unit = {
    val doc = HtmlParser.parse(content)
    childNodes.toArray.foreach(_.remove())
    doc.childNodes.toArray.foreach(appendChild(_))
  }

  /** String (reparsed; empty parse falls back to one TextNode) | node | nodes.
    * Does not set parentNode (quirk, src/index.ts:307–315).
    */
  def setContent(content: String): Unit = {
    val r = HtmlParser.parse(content)
    val nodes: Seq[DomNode] =
      if (r.childNodes.nonEmpty) r.childNodes.toSeq else Seq(new TextNode(content))
    childNodes.clear()
    childNodes ++= nodes
  }
  def setContent(content: DomNode): Unit = {
    childNodes.clear()
    childNodes += content
  }
  def setContent(content: Seq[DomNode]): Unit = {
    childNodes.clear()
    childNodes ++= content
  }

  def outerHTML: String = toHtml

  private def attrsJson: String = {
    val it = attributes.entrySet().iterator()
    val sb = new java.lang.StringBuilder("{")
    var first = true
    while (it.hasNext) {
      val e = it.next()
      if (!first) sb.append(',')
      first = false
      sb.append(JsonUtil.quote(e.getKey)).append(':').append(JsonUtil.quote(e.getValue))
    }
    sb.append('}').toString
  }

  /** Iterative (heap-stacked) like every other traversal — the natural
    * childNodes.map(_.toJsonString) recursion overflows the JVM stack on
    * ~10k-deep documents (COVERAGE.md divergence #2: the reference
    * recursion overflows the JS stack the same way; we must not).
    */
  def toJsonString: String = {
    val sb = new java.lang.StringBuilder
    val stack = new ArrayBuffer[AnyRef](32)
    stack += this
    while (stack.nonEmpty) {
      stack.remove(stack.length - 1) match {
        case s: String => sb.append(s)
        case e: Element =>
          sb.append("{\"type\":\"element\",\"tagName\":")
            .append(JsonUtil.quote(e.tagName))
            .append(",\"attributes\":").append(e.attrsJson)
            .append(",\"children\":[")
          stack += "]}"
          var j = e.childNodes.length - 1
          while (j >= 0) {
            stack += e.childNodes(j)
            if (j > 0) stack += ","
            j -= 1
          }
        case n: DomNode => sb.append(n.toJsonString) // text/comment leaves
      }
    }
    sb.toString
  }

  // -------------------------------------------------------------- attributes

  /** As-written attribute map (lazy; kAttributePattern semantics,
    * src/index.ts:560–574). Insertion-ordered; later duplicates overwrite in
    * place.
    */
  def rawAttributes: java.util.LinkedHashMap[String, String] = {
    if (_rawAttrs == null) _rawAttrs = AttrScanner.scanRawAttributes(rawAttrs)
    _rawAttrs
  }

  /** Entity-decoded attribute map (lazy, src/index.ts:524–545). */
  def attributes: java.util.LinkedHashMap[String, String] = {
    if (_attrs == null) {
      val m = new java.util.LinkedHashMap[String, String]
      val it = rawAttributes.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        m.put(e.getKey, Entities.decode(e.getValue))
      }
      _attrs = m
    }
    _attrs
  }

  def getAttribute(key: String): Option[String] =
    Option(attributes.get(key))

  /** src/index.ts:581–601 — updates shadow fields, both caches, and rebuilds
    * the raw string from the DECODED map (re-encoded); empty value → bare key.
    * Pass null to remove (reference `undefined`).
    */
  def setAttribute(key: String, value: String): Unit = {
    if (key == "id") id = if (value == null) "" else value
    else if (key == "class")
      classNames = if (value == null) Element.emptyClasses else Js.splitWs(value)
    val attrs = attributes
    if (value == null) attrs.remove(key) else attrs.put(key, value)
    if (_rawAttrs != null) {
      if (value == null) _rawAttrs.remove(key)
      else _rawAttrs.put(key, Entities.encodeSpecial(value))
    }
    rebuildRawAttrs(attrs)
  }

  def removeAttribute(key: String): Unit = setAttribute(key, null)

  /** Wholesale replacement (src/index.ts:611–632). Note the reference's
    * `else if`: class shadow is NOT updated when id is also present (quirk).
    */
  def setAttributes(newAttrs: Seq[(String, String)]): Unit = {
    val asMap = newAttrs.toMap
    if (asMap.get("id").exists(_.nonEmpty)) id = asMap("id")
    else if (asMap.get("class").exists(_.nonEmpty))
      classNames = Js.splitWs(asMap("class"))
    val attrs = attributes
    attrs.clear()
    newAttrs.foreach { case (k, v) => attrs.put(k, v) }
    val raw = rawAttributes
    raw.clear()
    newAttrs.foreach { case (k, v) => raw.put(k, Entities.encodeSpecial(v)) }
    rebuildRawAttrs(attrs)
  }

  private def rebuildRawAttrs(attrs: java.util.LinkedHashMap[String, String]): Unit = {
    val sb = new java.lang.StringBuilder
    val it = attrs.entrySet().iterator()
    var first = true
    while (it.hasNext) {
      val e = it.next()
      if (!first) sb.append(' ')
      first = false
      sb.append(e.getKey)
      if (e.getValue != "")
        sb.append("=\"").append(Entities.encodeSpecial(e.getValue)).append('"')
    }
    rawAttrs = sb.toString
  }

  // ------------------------------------------------------------------ query

  def querySelectorAll(selector: String): ArrayBuffer[Element] =
    Query.querySelectorAll(this, selector)

  def querySelectorAll(matcher: Matcher): ArrayBuffer[Element] =
    Query.querySelectorAll(this, matcher)

  def querySelector(selector: String): Option[Element] =
    Query.querySelector(this, selector)

  def querySelector(matcher: Matcher): Option[Element] =
    Query.querySelector(this, matcher)
}

private[graft] object JsonUtil {
  def quote(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      // exact JSON.stringify escaping (incl. \b and \f shorthands)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"').toString
  }
}

/** structuredText accumulation block (reference keeps a prependWhitespace
  * flag per block array — src/index.ts:232,250).
  */
private[kernel] final class Block {
  // single-part blocks dominate real documents: keep the first part inline
  // and allocate the spill buffer only on the second part
  var part0: String = null
  var rest: ArrayBuffer[String] = null
  var prependWhitespace: Boolean = false
  def isEmpty: Boolean = part0 == null
  def add(s: String): Unit =
    if (part0 == null) part0 = s
    else {
      if (rest == null) rest = new ArrayBuffer[String](4)
      rest += s
    }
  def joined: String =
    if (part0 == null) ""
    else if (rest == null) part0
    else {
      val sb = new java.lang.StringBuilder(part0)
      rest.foreach(sb.append)
      sb.toString
    }
}
private[kernel] object BlockExit
