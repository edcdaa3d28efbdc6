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
  *     numeric-unicode-map); > 0x10FFFF yields U+FFFD
  *   - unknown candidates are left verbatim
  *
  * Table scope: we vendor the HTML4/Latin-1/symbol/Greek set + `&apos;` +
  * `&euro;` + uppercase legacy aliases — every name the reference's test
  * corpus uses and ~all of real-world usage. Unknown (exotic HTML5
  * multi-codepoint) names pass through unchanged, which is also what
  * html-entities does for names absent from its table.
  *
  * encode == html-entities `encode(s)` defaults (mode "specialChars"):
  * only `& < > " '` are escaped, to their named forms.
  */
object Entities {

  // "name codepoint" pairs; names here resolve when written with a trailing ';'.
  private val namedTable: String =
    "quot 34 amp 38 apos 39 lt 60 gt 62 " +
      "nbsp 160 iexcl 161 cent 162 pound 163 curren 164 yen 165 brvbar 166 sect 167 " +
      "uml 168 copy 169 ordf 170 laquo 171 not 172 shy 173 reg 174 macr 175 deg 176 " +
      "plusmn 177 sup2 178 sup3 179 acute 180 micro 181 para 182 middot 183 cedil 184 " +
      "sup1 185 ordm 186 raquo 187 frac14 188 frac12 189 frac34 190 iquest 191 " +
      "Agrave 192 Aacute 193 Acirc 194 Atilde 195 Auml 196 Aring 197 AElig 198 Ccedil 199 " +
      "Egrave 200 Eacute 201 Ecirc 202 Euml 203 Igrave 204 Iacute 205 Icirc 206 Iuml 207 " +
      "ETH 208 Ntilde 209 Ograve 210 Oacute 211 Ocirc 212 Otilde 213 Ouml 214 times 215 " +
      "Oslash 216 Ugrave 217 Uacute 218 Ucirc 219 Uuml 220 Yacute 221 THORN 222 szlig 223 " +
      "agrave 224 aacute 225 acirc 226 atilde 227 auml 228 aring 229 aelig 230 ccedil 231 " +
      "egrave 232 eacute 233 ecirc 234 euml 235 igrave 236 iacute 237 icirc 238 iuml 239 " +
      "eth 240 ntilde 241 ograve 242 oacute 243 ocirc 244 otilde 245 ouml 246 divide 247 " +
      "oslash 248 ugrave 249 uacute 250 ucirc 251 uuml 252 yacute 253 thorn 254 yuml 255 " +
      "OElig 338 oelig 339 Scaron 352 scaron 353 Yuml 376 fnof 402 circ 710 tilde 732 " +
      "Alpha 913 Beta 914 Gamma 915 Delta 916 Epsilon 917 Zeta 918 Eta 919 Theta 920 " +
      "Iota 921 Kappa 922 Lambda 923 Mu 924 Nu 925 Xi 926 Omicron 927 Pi 928 Rho 929 " +
      "Sigma 931 Tau 932 Upsilon 933 Phi 934 Chi 935 Psi 936 Omega 937 " +
      "alpha 945 beta 946 gamma 947 delta 948 epsilon 949 zeta 950 eta 951 theta 952 " +
      "iota 953 kappa 954 lambda 955 mu 956 nu 957 xi 958 omicron 959 pi 960 rho 961 " +
      "sigmaf 962 sigma 963 tau 964 upsilon 965 phi 966 chi 967 psi 968 omega 969 " +
      "thetasym 977 upsih 978 piv 982 " +
      "ensp 8194 emsp 8195 thinsp 8201 zwnj 8204 zwj 8205 lrm 8206 rlm 8207 " +
      "ndash 8211 mdash 8212 lsquo 8216 rsquo 8217 sbquo 8218 ldquo 8220 rdquo 8221 " +
      "bdquo 8222 dagger 8224 Dagger 8225 bull 8226 hellip 8230 permil 8240 prime 8242 " +
      "Prime 8243 lsaquo 8249 rsaquo 8250 oline 8254 frasl 8260 euro 8364 " +
      "alefsym 8501 weierp 8472 image 8465 real 8476 trade 8482 " +
      "larr 8592 uarr 8593 rarr 8594 darr 8595 harr 8596 crarr 8629 " +
      "lArr 8656 uArr 8657 rArr 8658 dArr 8659 hArr 8660 " +
      "forall 8704 part 8706 exist 8707 empty 8709 nabla 8711 isin 8712 notin 8713 " +
      "ni 8715 prod 8719 sum 8721 minus 8722 lowast 8727 radic 8730 prop 8733 " +
      "infin 8734 ang 8736 and 8743 or 8744 cap 8745 cup 8746 int 8747 there4 8756 " +
      "sim 8764 cong 8773 asymp 8776 ne 8800 equiv 8801 le 8804 ge 8805 " +
      "sub 8834 sup 8835 nsub 8836 sube 8838 supe 8839 oplus 8853 otimes 8855 " +
      "perp 8869 sdot 8901 lceil 8968 rceil 8969 lfloor 8970 rfloor 8971 " +
      "lang 9001 rang 9002 loz 9674 spades 9824 clubs 9827 hearts 9829 diams 9830 " +
      "AMP 38 GT 62 LT 60 QUOT 34 COPY 169 REG 174"

  // HTML legacy names: also resolve WITHOUT a trailing ';' in body scope.
  private val legacyNames: Set[String] = Set(
    "AElig", "AMP", "Aacute", "Acirc", "Agrave", "Aring", "Atilde", "Auml",
    "COPY", "Ccedil", "ETH", "Eacute", "Ecirc", "Egrave", "Euml", "GT",
    "Iacute", "Icirc", "Igrave", "Iuml", "LT", "Ntilde", "Oacute", "Ocirc",
    "Ograve", "Oslash", "Otilde", "Ouml", "QUOT", "REG", "THORN", "Uacute",
    "Ucirc", "Ugrave", "Uuml", "Yacute", "aacute", "acirc", "acute", "aelig",
    "agrave", "amp", "aring", "atilde", "auml", "brvbar", "ccedil", "cedil",
    "cent", "copy", "curren", "deg", "divide", "eacute", "ecirc", "egrave",
    "eth", "euml", "frac12", "frac14", "frac34", "gt", "iacute", "icirc",
    "iexcl", "igrave", "iquest", "iuml", "laquo", "lt", "macr", "micro",
    "middot", "nbsp", "not", "ntilde", "oacute", "ocirc", "ograve", "ordf",
    "ordm", "oslash", "otilde", "ouml", "para", "plusmn", "pound", "quot",
    "raquo", "reg", "sect", "shy", "sup1", "sup2", "sup3", "szlig", "thorn",
    "times", "uacute", "ucirc", "ugrave", "uml", "uuml", "yacute", "yen",
    "yuml")

  private val named: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](1024)
    val it = namedTable.split(' ').iterator
    while (it.hasNext) {
      val name = it.next()
      val cp = it.next().toInt
      m.put(name, new String(Character.toChars(cp)))
    }
    m
  }

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
    if (code > 0x10FFFFL) sb.append('�')
    else if (code > 65535L) sb.appendCodePoint(code.toInt)
    else {
      val c = numericRemap.getOrElse(code.toInt, code.toInt)
      sb.append(c.toChar)
    }
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
            // parseInt semantics: cap absurd lengths to avoid overflow
            val hex = s.substring(j + 1, k)
            val code =
              if (hex.length > 8) 0x110000L
              else java.lang.Long.parseLong(hex, 16)
            appendCodePoint(sb, code)
            if (k < n && s.charAt(k) == ';') k += 1
            pos = k
            consumed = true
          }
        } else {
          var k = j
          while (k < n && isDigit(s.charAt(k))) k += 1
          if (k > j) {
            val dec = s.substring(j, k)
            val code =
              if (dec.length > 9) 0x110000L
              else java.lang.Long.parseLong(dec, 10)
            appendCodePoint(sb, code)
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
