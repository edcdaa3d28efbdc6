package graft.sources

/** Byte→text charset handling for crawl pages (real Common-Crawl HTML is
  * not all UTF-8): BOM detection, `<meta charset>` / `http-equiv`
  * sniffing in the first 1 KiB (the WHATWG prescan, simplified), and a
  * decode that never throws — unsupported or wrong declarations fall back
  * to UTF-8 with replacement chars, because a crawl task must not die on
  * one mislabeled page.
  */
object Charset {

  private val MetaRe =
    """(?i)<meta[^>]*charset\s*=\s*["']?\s*([A-Za-z0-9._:-]+)""".r

  /** Detected charset name (canonical Java name), defaulting to UTF-8. */
  def sniff(bytes: Array[Byte]): String = {
    if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xEF &&
      (bytes(1) & 0xFF) == 0xBB && (bytes(2) & 0xFF) == 0xBF) return "UTF-8"
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFE && (bytes(1) & 0xFF) == 0xFF)
      return "UTF-16BE"
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xFE)
      return "UTF-16LE"
    // prescan window: meta declarations live in <head>, ASCII-superset safe
    val head = new String(bytes, 0, math.min(bytes.length, 1024),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    MetaRe.findFirstMatchIn(head) match {
      case Some(m) =>
        val name = m.group(1)
        try java.nio.charset.Charset.forName(name).name()
        catch { case _: Exception => "UTF-8" } // unknown label: spec fallback
      case None => "UTF-8"
    }
  }

  /** Sniff + decode; never throws (malformed input maps to U+FFFD, exactly
    * what `new String(bytes, charset)` does).
    */
  def decode(bytes: Array[Byte]): String = {
    val cs =
      try java.nio.charset.Charset.forName(sniff(bytes))
      catch { case _: Exception => java.nio.charset.StandardCharsets.UTF_8 }
    val s = new String(bytes, cs)
    // strip a decoded BOM so it can't leak into text extraction
    if (s.nonEmpty && s.charAt(0) == '\uFEFF') s.substring(1) else s
  }
}

/** XML-layer lexing shared by the sitemap/feed sources: constructs that are
  * XML (not HTML) and that the kernel — faithfully to the reference, whose
  * kMarkupPattern (/root/reference/src/index.ts:833) recognizes only `<!--`
  * — would otherwise tokenize as literal text.
  */
object Xml {

  /** Replace every `<![CDATA[...]]>` section with entity-ENCODED text
    * BEFORE the kernel parse. XML semantics: CDATA content is literal (no
    * markup, no entity decoding inside), and real-world RSS wraps nearly
    * every title/description in CDATA. Encoding `&`/`<`/`>` here is exactly
    * inverted by the kernel's entity decode on `.text`, so extraction
    * returns the literal CDATA bytes — and markup inside CDATA stays text
    * instead of sprouting elements. The KERNEL itself stays unchanged
    * (reference-faithful: bare `<![CDATA[` in HTML remains literal text);
    * this is a feed/sitemap-layer concern only. Unterminated sections run
    * to end of input (lenient, like every other malformed-input path).
    */
  def unwrapCdata(xml: String): String = {
    var i = xml.indexOf("<![CDATA[")
    if (i < 0) return xml
    val sb = new java.lang.StringBuilder(xml.length + 64)
    var pos = 0
    while (i >= 0) {
      sb.append(xml, pos, i)
      val start = i + 9
      val end = xml.indexOf("]]>", start)
      val stop = if (end >= 0) end else xml.length
      var j = start
      while (j < stop) {
        xml.charAt(j) match {
          case '&' => sb.append("&amp;")
          case '<' => sb.append("&lt;")
          case '>' => sb.append("&gt;")
          case c   => sb.append(c)
        }
        j += 1
      }
      pos = if (end >= 0) end + 3 else xml.length
      i = xml.indexOf("<![CDATA[", pos)
    }
    sb.append(xml, pos, xml.length)
    sb.toString
  }
}

/** Sitemap / sitemap-index parsing: the machine-generated XML is regular
  * enough for the lenient HTML kernel parser, and `<loc>` extraction is a
  * plain selector query — one more consumer of the same kernel (no XML
  * library, none exists in this sandbox's dependency set).
  */
object Sitemap {

  /** All `<loc>` values (urlset entries AND nested sitemap-index entries),
    * document order, trimmed. CDATA-wrapped locs unwrap first
    * ([[Xml.unwrapCdata]]).
    */
  def locations(xml: String): Seq[String] = {
    val root = graft.kernel.HtmlParser.parse(Xml.unwrapCdata(xml))
    graft.kernel.Query
      .querySelectorAll(root, graft.kernel.Query.compileUnion("loc"))
      .map(_.text.trim).toSeq
  }

  final case class SitemapEntry(loc: String, lastmod: String)

  /** Full `<url>`/`<sitemap>` entries with their `<lastmod>` — the field
    * incremental recrawl schedules on (a crawler re-fetches only entries
    * whose lastmod postdates its last fetch; at steady state most of a
    * sitemap is unchanged, so this is the sitemap-side twin of the
    * crawl-snapshot delta). Entries without a `<loc>` are skipped; a
    * missing `<lastmod>` yields "" (caller decides the re-fetch default).
    */
  def entries(xml: String): Seq[SitemapEntry] = {
    import graft.kernel.{HtmlParser, Query}
    val root = HtmlParser.parse(Xml.unwrapCdata(xml))
    val selEntry = Query.compileUnion("url,sitemap")
    val selLoc = Query.compileUnion("loc")
    val selMod = Query.compileUnion("lastmod")
    Query.querySelectorAll(root, selEntry).iterator.flatMap { u =>
      Query.querySelector(u, selLoc).map(_.text.trim).filter(_.nonEmpty)
        .map { loc =>
          SitemapEntry(loc,
            Query.querySelector(u, selMod).map(_.text.trim).getOrElse(""))
        }
    }.toSeq
  }
}

/** RSS 2.0 / Atom feed ingestion — the OTHER frontier-seed source next to
  * sitemaps: feeds surface fresh urls hours before they reach sitemaps,
  * which is how a crawl keeps up with news/blog content. Parsed by the same
  * kernel (feeds are XML, the parser's unknown-tag handling covers them);
  * entry url + title + publication timestamp per item.
  */
object Feed {

  final case class FeedEntry(url: String, title: String, published: String)

  /** RSS `<item>` (link text, title text, pubDate text) and Atom `<entry>`
    * (link[href] attr, title text, updated/published text), document order.
    * Feeds in the wild mix conventions; both are always probed.
    *
    * RSS quirk handled explicitly: `link` is a VOID element under HTML
    * parsing rules, so `<link>url</link>` parses as an empty element
    * followed by a sibling TEXT node — the url is recovered from the text
    * node immediately after the `<link>` inside its parent item.
    */
  def entries(xml: String): Seq[FeedEntry] = {
    import graft.kernel.{HtmlParser, Query, Element, TextNode}
    // real-world feeds wrap titles/descriptions (and sometimes links) in
    // CDATA — unwrap at the XML layer before the kernel sees the bytes
    val root = HtmlParser.parse(Xml.unwrapCdata(xml))
    val unions = scala.collection.mutable.HashMap.empty[String, Array[Array[graft.kernel.SelectorPart]]]
    def sel(e: Element, s: String) = Query.querySelector(e,
      unions.getOrElseUpdate(s, Query.compileUnion(s)))
    val items = Query.querySelectorAll(root, Query.compileUnion("item,entry"))
    items.iterator.map { it =>
      val link = sel(it, "link").map { l =>
        val href = l.getAttribute("href")
        if (href.exists(_.nonEmpty)) href.get
        else if (l.text.trim.nonEmpty) l.text.trim
        else {
          // RSS void-link: the url is the sibling text node after <link>
          val p = if (l.parentNode != null) l.parentNode else it
          val idx = p.childNodes.indexWhere(_ eq l)
          p.childNodes.drop(idx + 1).collectFirst {
            case t: TextNode if !t.isWhitespace => t.text.trim
          }.getOrElse("")
        }
      }.getOrElse("")
      val title = sel(it, "title").map(_.text.trim).getOrElse("")
      val published = sel(it, "pubDate").orElse(sel(it, "published"))
        .orElse(sel(it, "updated")).map(_.text.trim).getOrElse("")
      FeedEntry(link, title, published)
    }.toSeq
  }
}
