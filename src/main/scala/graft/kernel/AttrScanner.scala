package graft.kernel

/** Attribute-blob scanners cloning the reference's two attribute regexes.
  *
  *  - kIdClassAttributePattern (/root/reference/src/index.ts:834):
  *    `/(^|\s)(id|class)\s*=\s*("([^"]+)"|'([^']+)'|(\S+))/ig`
  *    Eager ctor extraction; quoted values must be NON-empty; only
  *    exact-lowercase keys feed the id/classNames shorthand fields.
  *
  *  - kAttributePattern (/root/reference/src/index.ts:835):
  *    `/([a-z][-.:0-9_a-z]*)(\s*=\s*("([^"]*)"|'([^']*)'|(\S+)))?/ig`
  *    Lazy rawAttributes map; quoted values may be empty; keys match
  *    anywhere (junk tokens inside quotes yield attrs — pinned quirk).
  */
private[kernel] object AttrScanner {

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** `[-.:0-9_a-z]` with the i flag. */
  private[kernel] def isNameChar(c: Char): Boolean =
    isAsciiLetter(c) || (c >= '0' && c <= '9') ||
      c == '-' || c == '.' || c == ':' || c == '_'

  /** Populate el.id / el.classNames from el.rawAttrs (ctor semantics). */
  def extractIdClass(el: Element): Unit = {
    val s = el.rawAttrs
    if (s.isEmpty) return
    val n = s.length
    var i = 0
    while (i < n) {
      if (i == 0 || Js.isSpace(s.charAt(i - 1))) {
        var keyLen = 0
        if (s.regionMatches(true, i, "class", 0, 5)) keyLen = 5
        else if (s.regionMatches(true, i, "id", 0, 2)) keyLen = 2
        if (keyLen > 0) {
          // exact-lowercase check WITHOUT materializing the key substring
          // (only exact-lowercase keys feed the shorthand fields; a mixed-
          // case ID= still consumes its value region, setting nothing)
          val exactId = keyLen == 2 &&
            s.charAt(i) == 'i' && s.charAt(i + 1) == 'd'
          val exactClass = keyLen == 5 && s.regionMatches(i, "class", 0, 5)
          var j = i + keyLen
          while (j < n && Js.isSpace(s.charAt(j))) j += 1
          if (j < n && s.charAt(j) == '=') {
            j += 1
            while (j < n && Js.isSpace(s.charAt(j))) j += 1
            var value: String = null
            var end = j
            if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
              val q = s.charAt(j)
              val close = s.indexOf(q, j + 1)
              if (close > j + 1) { // quoted value must be non-empty
                value = s.substring(j + 1, close)
                end = close + 1
              }
            }
            if (value == null) {
              // bare (\S+): greedy non-whitespace run (may include quotes)
              var b = j
              while (b < n && !Js.isSpace(s.charAt(b))) b += 1
              if (b > j) { value = s.substring(j, b); end = b }
            }
            if (value != null) {
              if (exactId) el.id = value
              else if (exactClass) el.classNames = Js.splitWs(value)
              i = end
            } else i += 1
          } else i += 1
        } else i += 1
      } else i += 1
    }
  }

  /** kAttributePattern over a rawAttrs string → insertion-ordered map. */
  def scanRawAttributes(s: String): java.util.LinkedHashMap[String, String] = {
    val m = new java.util.LinkedHashMap[String, String]
    if (s == null || s.isEmpty) return m
    val n = s.length
    var i = 0
    while (i < n) {
      if (isAsciiLetter(s.charAt(i))) {
        var j = i + 1
        while (j < n && isNameChar(s.charAt(j))) j += 1
        val key = s.substring(i, j)
        var value = ""
        var end = j
        // optional  \s* = \s* value
        var k = j
        while (k < n && Js.isSpace(s.charAt(k))) k += 1
        if (k < n && s.charAt(k) == '=') {
          k += 1
          while (k < n && Js.isSpace(s.charAt(k))) k += 1
          if (k < n && (s.charAt(k) == '"' || s.charAt(k) == '\'')) {
            val q = s.charAt(k)
            val close = s.indexOf(q, k + 1)
            if (close >= 0) {
              value = s.substring(k + 1, close) // may be empty
              end = close + 1
            } else {
              // unterminated quote: quoted alternatives fail, bare (\S+)
              // matches the quote char onward
              var b = k
              while (b < n && !Js.isSpace(s.charAt(b))) b += 1
              if (b > k) { value = s.substring(k, b); end = b }
            }
          } else {
            var b = k
            while (b < n && !Js.isSpace(s.charAt(b))) b += 1
            if (b > k) { value = s.substring(k, b); end = b }
            // else: `key=` at end → value group absent → key-only
          }
        }
        m.put(key, value)
        i = end
      } else i += 1
    }
    m
  }
}
