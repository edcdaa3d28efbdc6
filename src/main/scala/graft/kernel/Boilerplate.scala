package graft.kernel

import scala.collection.mutable.ArrayBuffer

/** Main-content extraction heuristics: strip boilerplate subtrees from a
  * parsed DOM so `structuredText` yields the page's content, not its chrome.
  *
  * The reference library stops at `structuredText` (it has no notion of
  * boilerplate — /root/reference/src/index.ts:231–268 flushes every block);
  * this module is the pipeline-layer heuristic the north rule adds on top
  * ("HTML boilerplate strip … DOM heuristics"). Three deterministic rules,
  * applied in order, all standard in content-extraction literature (cf.
  * Kohlschütter et al., "Boilerplate Detection using Shallow Text Features",
  * WSDM 2010 — we use the structural subset that needs no trained model):
  *
  *   1. TAG strip: `<script>/<style>/<nav>/<footer>/<aside>/…` subtrees are
  *      never content.
  *   2. CLASS/ID-token strip: an element whose class list contains a
  *      boilerplate token ("sidebar", "banner", …) or whose id splits
  *      (on `-`/`_`) into one is chrome by convention.
  *   3. LINK-DENSITY prune: a remaining container block whose subtree text
  *      is ≥ `maxLinkDensity` anchor text is navigation (a link farm), not
  *      prose. Applied top-down: an over-dense container is dropped whole.
  *
  * Everything is a pure function of the DOM — no RNG, no wall clock — so the
  * q42 DuckDB oracle can predict the extracted text exactly.
  *
  * Scale shape: runs inside the same per-partition kernel pass as parsing
  * (O(doc) work, zero shuffles); the Spark surface is
  * [[graft.functions.HtmlFunctions.mainContent]].
  */
object Boilerplate {

  /** Subtrees under these tags are never main content. */
  val stripTags: Set[String] = Set(
    "script", "style", "noscript", "template", "nav", "header", "footer",
    "aside", "form", "iframe", "svg", "button", "select", "object", "embed")

  /** Boilerplate vocabulary matched against class tokens and `-`/`_`-split
    * id segments (case-insensitive, whole-token — "sidebar" strips
    * `class="sidebar"`, not `class="considerable"`).
    */
  val stripTokens: Set[String] = Set(
    "nav", "navbar", "menu", "sidebar", "footer", "header", "banner", "ad",
    "ads", "advert", "advertisement", "promo", "sponsor", "cookie", "popup",
    "modal", "share", "social", "breadcrumb", "breadcrumbs", "comment",
    "comments", "related", "widget", "pagination")

  /** Container tags eligible for the link-density prune (block containers a
    * link farm lives in; `p`/`li` are excluded so short inline "read more"
    * paragraphs survive unless a rule-1/2 ancestor catches them).
    */
  val densityTags: Set[String] = Set("div", "section", "ul", "ol", "table")

  def isBoilerplateElement(e: Element): Boolean = {
    val tag = e.tagName.toLowerCase
    stripTags.contains(tag) ||
      e.classNames.exists(c => stripTokens.contains(c.toLowerCase)) ||
      (e.id.nonEmpty && e.id.toLowerCase.split("[-_]").exists(stripTokens.contains))
  }

  /** (totalChars, anchorChars) over a subtree: decoded text length, and the
    * portion of it under an `<a>` ancestor. Whitespace-only text nodes are
    * ignored (indentation between links must not dilute link density).
    */
  private[kernel] def textStats(root: Element): (Int, Int) = {
    var total = 0
    var anchor = 0
    // (node, underAnchor)
    val stack = new ArrayBuffer[(DomNode, Boolean)](16)
    var i = root.childNodes.length - 1
    val rootIsA = root.tagName.equalsIgnoreCase("a")
    while (i >= 0) { stack += ((root.childNodes(i), rootIsA)); i -= 1 }
    while (stack.nonEmpty) {
      val (node, inA) = stack.remove(stack.length - 1)
      node match {
        case e: Element =>
          val childInA = inA || e.tagName.equalsIgnoreCase("a")
          var j = e.childNodes.length - 1
          while (j >= 0) { stack += ((e.childNodes(j), childInA)); j -= 1 }
        case t: TextNode =>
          if (!t.isWhitespace) {
            val n = t.text.length
            total += n
            if (inA) anchor += n
          }
        case _ => // comments carry no content signal
      }
    }
    (total, anchor)
  }

  /** Per-element (totalChars, anchorChars) for EVERY element in one
    * bottom-up pass — O(doc) total. The naive alternative (calling
    * [[textStats]] per density-checked container) re-walks each subtree
    * and goes O(depth²): a 100k-deep nested-div page (real crawls contain
    * such pathology) took ~90 s; this pass brings the whole strip to the
    * same O(doc) cost as parsing. Recurrences:
    *
    *   total(e)  = Σ total(childElem) + Σ len(nonWsText)
    *   anchor(e) = Σ (childElem is <a> ? total(childElem) : anchor(childElem))
    *
    * which match [[textStats]]'s under-an-anchor-ancestor-within-the-
    * subtree semantics exactly (an `<a>` subtree root itself is only
    * relevant for rootIsA, and density checks never run on `<a>`).
    */
  private def allTextStats(root: Element): java.util.IdentityHashMap[Element, (Int, Int)] = {
    // reversed pre-order lists every element after all of its descendants
    val pre = new ArrayBuffer[Element](64)
    val stack = new ArrayBuffer[Element](16)
    stack += root
    while (stack.nonEmpty) {
      val e = stack.remove(stack.length - 1)
      pre += e
      var i = e.childNodes.length - 1
      while (i >= 0) {
        e.childNodes(i) match {
          case c: Element => stack += c
          case _ =>
        }
        i -= 1
      }
    }
    val stats = new java.util.IdentityHashMap[Element, (Int, Int)](pre.length * 2)
    var p = pre.length - 1
    while (p >= 0) {
      val e = pre(p)
      var total = 0
      var anchor = 0
      var i = 0
      while (i < e.childNodes.length) {
        e.childNodes(i) match {
          case c: Element =>
            val (ct, ca) = stats.get(c)
            total += ct
            anchor += (if (c.tagName.equalsIgnoreCase("a")) ct else ca)
          case t: TextNode =>
            if (!t.isWhitespace) total += t.text.length
          case _ =>
        }
        i += 1
      }
      stats.put(e, (total, anchor))
      p -= 1
    }
    stats
  }

  /** In-place boilerplate strip (kernel trees are per-partition ephemeral,
    * so mutation is safe — same convention as the §2.D mutation ops).
    * Returns the number of subtrees removed. Top-down: a removed subtree's
    * descendants are neither visited nor counted. Density decisions read
    * the [[allTextStats]] precomputation (every container is evaluated
    * before any of its own descendants are stripped, so the original-tree
    * stats are exactly what the per-container walk would have measured).
    */
  def strip(root: Element, maxLinkDensity: Double = 0.5): Int = {
    val stats = allTextStats(root)
    var removed = 0
    val stack = new ArrayBuffer[Element](16)
    stack += root
    while (stack.nonEmpty) {
      val e = stack.remove(stack.length - 1)
      // snapshot: we detach children while iterating
      val kids = e.childNodes.collect { case c: Element => c }.toArray
      var i = 0
      while (i < kids.length) {
        val k = kids(i)
        if (isBoilerplateElement(k)) {
          e.removeChild(k)
          removed += 1
        } else if (densityTags.contains(k.tagName.toLowerCase) && {
          val (total, anchor) = stats.get(k)
          total > 0 && anchor.toDouble / total >= maxLinkDensity
        }) {
          e.removeChild(k)
          removed += 1
        } else stack += k
        i += 1
      }
    }
    removed
  }

  final case class MainContent(main_text: String, n_stripped: Int)

  /** Parse → strip → structuredText, one kernel pass per document. */
  def mainContent(html: String, maxLinkDensity: Double = 0.5): MainContent = {
    val root = HtmlParser.parse(html)
    val n = strip(root, maxLinkDensity)
    MainContent(root.structuredText, n)
  }
}
