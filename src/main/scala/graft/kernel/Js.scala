package graft.kernel

/** JavaScript string/regex semantics helpers.
  *
  * The reference engine (/root/reference/src/index.ts) leans on JS `\s`,
  * `String.prototype.trim`, and `String.prototype.split(/\s+/)` — all of
  * which differ from their JVM cousins (Java's `\s` is ASCII-only; Java's
  * `split` drops trailing empty strings). Byte-identical extraction
  * requires cloning the JS behavior exactly.
  */
object Js {

  /** Tag names that collide with Object.prototype members are TRUTHY in
    * every `jsObjectLiteral[tag]` lookup in the reference (and in
    * `options[tag]`). Only names that fit the tag grammar (first char a
    * letter) are listed. Node-verified behavior — see HtmlParser/Dom usage.
    */
  val protoKeys: Set[String] = Set(
    "constructor", "toString", "toLocaleString", "valueOf", "hasOwnProperty",
    "isPrototypeOf", "propertyIsEnumerable")

  /** JS RegExp `\s` / `String.trim` whitespace set (ECMA-262 WhiteSpace ∪
    * LineTerminator): TAB VT FF SP NBSP ZWNBSP + Unicode Zs + LF CR LS PS.
    */
  def isSpace(c: Char): Boolean =
    if (c <= 0x0020) c == 0x20 || (c >= 0x09 && c <= 0x0D)
    else
      c == 0x00A0 || c == 0x1680 || (c >= 0x2000 && c <= 0x200A) ||
        c == 0x2028 || c == 0x2029 || c == 0x202F || c == 0x205F ||
        c == 0x3000 || c == 0xFEFF

  /** `s.trim()` with the JS whitespace set. */
  def trim(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isSpace(s.charAt(i))) i += 1
    while (j > i && isSpace(s.charAt(j - 1))) j -= 1
    if (i == 0 && j == s.length) s else s.substring(i, j)
  }

  /** `s.replace(/\s+$/, '')` — right trim only. */
  def trimRight(s: String): String = {
    var j = s.length
    while (j > 0 && isSpace(s.charAt(j - 1))) j -= 1
    if (j == s.length) s else s.substring(0, j)
  }

  /** `s.split(/\s+/)` with exact JS semantics: separators are runs of
    * whitespace; a leading run yields a leading "", a trailing run yields a
    * trailing "" (Java's split drops the latter). `"".split(/\s+/) == [""]`.
    */
  def splitWs(s: String): Array[String] = {
    val n = s.length
    var i = 0
    while (i < n && !isSpace(s.charAt(i))) i += 1
    if (i == n) return Array(s) // no whitespace at all — the common case
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var segStart = 0
    while (i < n) {
      if (isSpace(s.charAt(i))) {
        out += s.substring(segStart, i)
        i += 1
        while (i < n && isSpace(s.charAt(i))) i += 1
        segStart = i
      } else i += 1
    }
    out += s.substring(segStart, n)
    out.toArray
  }

  /** `s.replace(/\s{2,}/g, ' ')` — collapse runs of 2+ whitespace chars to a
    * single ASCII space; single whitespace chars are left verbatim.
    */
  def collapseWs2(s: String): String = {
    val n = s.length
    var i = 0
    var sb: java.lang.StringBuilder = null
    while (i < n) {
      if (isSpace(s.charAt(i)) && i + 1 < n && isSpace(s.charAt(i + 1))) {
        if (sb == null) { sb = new java.lang.StringBuilder(n); sb.append(s, 0, i) }
        sb.append(' ')
        i += 1
        while (i < n && isSpace(s.charAt(i))) i += 1
      } else {
        if (sb != null) sb.append(s.charAt(i))
        i += 1
      }
    }
    if (sb == null) s else sb.toString
  }

  /** `/^(\s|&nbsp;)*$/.test(s)` — whitespace-only test where the literal
    * string "&nbsp;" also counts as whitespace (reference src/index.ts:83–85).
    */
  def isWhitespaceOrNbsp(s: String): Boolean = {
    var i = 0
    val n = s.length
    while (i < n) {
      if (isSpace(s.charAt(i))) i += 1
      else if (s.startsWith("&nbsp;", i)) i += 6
      else return false
    }
    true
  }
}
