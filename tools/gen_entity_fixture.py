#!/usr/bin/env python3
"""Generate src/test/resources/entities_html5.tsv — a NON-CIRCULAR
differential fixture for graft.kernel.Entities.decode.

Expected values come from Python `html.unescape` (WHATWG reference
implementation), which is independent of both Entities.scala and the diff
harness's entities_shim.js. Covers every one of the 2,125 WHATWG names in
four contexts, the 106 legacy names without semicolons, prefix-collision
probes, and numeric references in the range where html.unescape and
html-entities@2.3.2 agree.

Known, documented semantic differences between html-entities (which we
follow) and html.unescape (which this fixture uses as the expected value)
are EXCLUDED rather than asserted:
  - surrogate code points: html-entities emits lone surrogates, WHATWG U+FFFD
  - U+10FFFF / noncharacters / C0-C1 controls outside the windows-1252 remap:
    WHATWG substitutes or strips, html-entities passes through (and maps
    exactly U+10FFFF to U+FFFD via its `>= 0x10ffff` bound)

Each line: escaped(input) TAB escaped(expected); escaping: \\ -> \\\\,
TAB -> \\t, LF -> \\n, CR -> \\r (entity values can contain all three).
"""
import html
import html.entities as he
import os

h = he.html5
full = sorted(k[:-1] for k in h if k.endswith(";"))
legacy = sorted(k for k in h if not k.endswith(";"))


def esc(s):
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
            .replace("\n", "\\n").replace("\r", "\\r"))


cases = []
for name in full:
    cases.append("&%s;" % name)                 # bare
    cases.append("x&%s;y" % name)               # mid-text
    cases.append("&%s" % name)                  # no semicolon (legacy or verbatim)
    cases.append("&%sZZ;" % name)               # alnum tail (legacy-prefix or verbatim)
for name in legacy:
    cases.append("pre &%s post" % name)
# prefix-collision probes (legacy name inside a longer run)
cases += ["&notit;", "&notin;", "&notinva;", "&copyright;", "&copysr;",
          "&centerdot;", "&cent;x", "&timesbar;", "&timesb;", "&times",
          "&ampx", "&amp;x", "&ltcc;", "&lt;cc", "&gtrapprox;", "&gtr",
          "&divideontimes;", "&divide", "&boxbox;", "&Afoo;", "&foo&amp;bar"]
# numeric refs in the agreeing range
cases += ["&#65;", "&#065;", "&#0000065;", "&#x41;", "&#X41;", "&#x041;",
          "&#x0000000000041;", "&#160;", "&#128;", "&#129;", "&#141;",
          "&#145;", "&#159;", "&#8364;", "&#x20AC;", "&#x1F600;", "&#66",
          "&#x42", "&#999999999;", "&#x110000;", "&#xFFFFFFFFFF;", "&#0;",
          "&#x0;", "&#13;", "a&#65;b&#66;c", "&#65&#66;", "&#;", "&#x;",
          "&#xg;", "&", "&&amp;&", "&;", "& amp;", "&#"]

path = os.path.join(os.path.dirname(__file__), "..",
                    "src/test/resources/entities_html5.tsv")
os.makedirs(os.path.dirname(path), exist_ok=True)
with open(path, "w") as f:
    for c in cases:
        f.write("%s\t%s\n" % (esc(c), esc(html.unescape(c))))
print("wrote %s (%d cases)" % (os.path.normpath(path), len(cases)))
