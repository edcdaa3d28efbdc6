package graft.kernel

/** HTML entity codec cloning the behavior of html-entities@2.3.2 (the
  * reference's only runtime dependency; used by `text`, `attributes`,
  * `setAttribute` — /root/reference/src/index.ts:1,38,530,597).
  *
  * decode == html-entities `decode(s)` defaults (level "all", scope "body"):
  *   - candidate pattern `&(?:#\d+|#[xX][\da-fA-F]+|[0-9a-zA-Z]+);?`
  *   - named references resolved via exact-string lookup (incl. the optional
  *     trailing `;`); names terminated by `;` use the full table, bare names
  *     resolve only if they are in the HTML legacy (no-semicolon) set
  *   - numeric references: decimal/hex, trailing `;` optional; code points in
  *     the windows-1252 C1 range are remapped (html-entities
  *     numeric-unicode-map); >= 0x10FFFF yields U+FFFD (html-entities uses
  *     `decodeCode >= 0x10ffff ? outOfBoundsChar : ...`, so U+10FFFF itself
  *     is out of bounds); surrogate code points pass through as lone
  *     surrogates (String.fromCharCode semantics) — unlike WHATWG/Python
  *     html.unescape, which substitutes U+FFFD
  *   - unknown candidates are left verbatim
  *
  * Table scope: the FULL WHATWG set — 2,125 semicolon'd names (incl.
  * multi-codepoint entities like `&NotEqualTilde;` → U+2242 U+0338) plus the
  * 106-name legacy no-semicolon subset, generated into EntityData.scala by
  * tools/gen_entity_table.py from Python stdlib `html.entities.html5` (the
  * same WHATWG entities.json table html-entities@2.3.2 ships). Coverage is
  * differentially pinned against Python `html.unescape` by EntitiesHtml5Spec
  * over every name (fixture from tools/gen_entity_fixture.py) — a check
  * independent of both this file and the diff-harness shim.
  *
  * Longest-match note: html-entities resolves no-semicolon legacy prefixes
  * via an ordered regex alternation; we use longest-first prefix search.
  * These are equivalent because no legacy name is a proper prefix of another
  * legacy name (verified at generation time).
  *
  * encode == html-entities `encode(s)` defaults (mode "specialChars"):
  * only `& < > " '` are escaped, to their named forms.
  */
object Entities {

  // Full WHATWG table (EntityData is generated — see header). Keys are names
  // WITHOUT the trailing ';'; they resolve when written with one. Values may
  // be multi-codepoint strings.
  private val named: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](4096)
    val sb = new java.lang.StringBuilder(4)
    EntityData.packed.foreach { chunk =>
      val it = chunk.split(' ').iterator
      while (it.hasNext) {
        val name = it.next()
        sb.setLength(0)
        it.next().split(':').foreach(cp => sb.appendCodePoint(cp.toInt))
        m.put(name, sb.toString)
      }
    }
    m
  }

  // WHATWG legacy names: also resolve WITHOUT a trailing ';' in body scope.
  private val legacyNames: Set[String] = EntityData.legacyPacked.split(' ').toSet

  /** windows-1252 remap of C1 code points (html-entities numeric-unicode-map). */
  private val numericRemap: Map[Int, Int] = Map(
    0 -> 65533, 128 -> 8364, 130 -> 8218, 131 -> 402, 132 -> 8222,
    133 -> 8230, 134 -> 8224, 135 -> 8225, 136 -> 710, 137 -> 8240,
    138 -> 352, 139 -> 8249, 140 -> 338, 142 -> 381, 145 -> 8216,
    146 -> 8217, 147 -> 8220, 148 -> 8221, 149 -> 8226, 150 -> 8211,
    151 -> 8212, 152 -> 732, 153 -> 8482, 154 -> 353, 155 -> 8250,
    156 -> 339, 158 -> 382, 159 -> 376)

  private val maxLegacyLen: Int = legacyNames.iterator.map(_.length).max

  private def isAlnum(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private def isHex(c: Char): Boolean =
    isDigit(c) || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def appendCodePoint(sb: java.lang.StringBuilder, code: Long): Unit = {
    // html-entities: `decodeCode >= 0x10ffff ? outOfBoundsChar : ...` —
    // U+10FFFF itself is treated as out of bounds
    if (code >= 0x10FFFFL) sb.append('�')
    else if (code > 65535L) sb.appendCodePoint(code.toInt)
    else {
      val c = numericRemap.getOrElse(code.toInt, code.toInt)
      sb.append(c.toChar)
    }
  }

  /** JS `parseInt` on an unbounded digit string: leading zeros don't change
    * the value, and anything that can't fit is still >= 0x10FFFF (precision
    * loss beyond 2^53 is irrelevant — every such value maps to U+FFFD).
    */
  private def parseDigits(s: String, radix: Int): Long = {
    var i = 0
    val n = s.length
    while (i < n && s.charAt(i) == '0') i += 1
    val sig = n - i // significant digits
    if (sig == 0) 0L
    else if (sig > (if (radix == 16) 8 else 9)) 0x110000L
    else java.lang.Long.parseLong(s.substring(i), radix)
  }

  /** html-entities decode, defaults (level=all, scope=body). */
  def decode(s: String): String = {
    var amp = s.indexOf('&')
    if (amp < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pos = 0
    while (amp >= 0) {
      sb.append(s, pos, amp)
      pos = amp
      var i = amp + 1
      var consumed = false
      if (i < n && s.charAt(i) == '#') {
        var j = i + 1
        if (j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) {
          var k = j + 1
          while (k < n && isHex(s.charAt(k))) k += 1
          if (k > j + 1) {
            appendCodePoint(sb, parseDigits(s.substring(j + 1, k), 16))
            if (k < n && s.charAt(k) == ';') k += 1
            pos = k
            consumed = true
          }
        } else {
          var k = j
          while (k < n && isDigit(s.charAt(k))) k += 1
          if (k > j) {
            appendCodePoint(sb, parseDigits(s.substring(j, k), 10))
            if (k < n && s.charAt(k) == ';') k += 1
            pos = k
            consumed = true
          }
        }
      } else {
        var k = i
        while (k < n && isAlnum(s.charAt(k))) k += 1
        if (k > i) {
          val name = s.substring(i, k)
          val hasSemi = k < n && s.charAt(k) == ';'
          val full = if (hasSemi) named.get(name) else null
          if (full != null) {
            sb.append(full)
            pos = k + 1
            consumed = true
          } else {
            // WHATWG longest-match semantics (mirrored by html-entities'
            // longest-first alternation): a legacy no-semicolon name may
            // match as a PREFIX of a longer alnum run — "&copyright;" →
            // "©right;", "&ampx" → "&x"
            var plen = math.min(name.length, maxLegacyLen)
            var found = -1
            while (plen >= 2 && found < 0) {
              if (legacyNames.contains(name.substring(0, plen))) found = plen
              plen -= 1
            }
            if (found > 0) {
              sb.append(named.get(name.substring(0, found)))
              pos = i + found // the rest of the run (and any ';') stays
            } else {
              // unknown candidate: emitted verbatim (incl. optional ';')
              pos = if (hasSemi) k + 1 else k
              sb.append(s, amp, pos)
            }
            consumed = true
          }
        }
      }
      if (!consumed) { sb.append('&'); pos = amp + 1 }
      amp = s.indexOf('&', pos)
    }
    sb.append(s, pos, n)
    sb.toString
  }

  /** html-entities encode, defaults (mode=specialChars): escape `& < > " '`. */
  def encodeSpecial(s: String): String = {
    var i = 0
    val n = s.length
    var sb: java.lang.StringBuilder = null
    while (i < n) {
      val c = s.charAt(i)
      val repl = (c: @annotation.switch) match {
        case '&' => "&amp;"
        case '<' => "&lt;"
        case '>' => "&gt;"
        case '"' => "&quot;"
        case '\'' => "&apos;"
        case _ => null
      }
      if (repl != null) {
        if (sb == null) { sb = new java.lang.StringBuilder(n + 16); sb.append(s, 0, i) }
        sb.append(repl)
      } else if (sb != null) sb.append(c)
      i += 1
    }
    if (sb == null) s else sb.toString
  }
}
