#!/usr/bin/env python3
"""Deterministic fuzz-corpus generator for differential testing (kernel vs
transpiled reference). Seeded — same inputs every run.

Usage: gen_fuzz.py <outdir> [n=400] [seed=42]
"""
import random, sys, os

outdir = sys.argv[1]
n = int(sys.argv[2]) if len(sys.argv) > 2 else 400
seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
os.makedirs(outdir, exist_ok=True)
rng = random.Random(seed)

TAGS = ["div", "p", "span", "a", "li", "ul", "ol", "td", "tr", "th", "table",
        "b", "i", "h1", "h2", "h3", "section", "article", "aside", "nav",
        "form", "header", "footer", "main", "colgroup", "thead", "tbody",
        "my-widget", "ns:tag", "DIV", "P", "Span",
        "toString", "valueOf", "constructor", "hasOwnProperty"]
VOID = ["br", "img", "input", "meta", "link", "hr", "col", "source", "base", "area"]
RAW = ["script", "style", "pre", "noscript"]
TEXTS = ["hello world", "a  b   c", " leading", "trailing ", "x&amp;y",
         "&nbsp;", "&eacute;t&eacute", "&#65;&#x42;", "&bogus;", "tom & jerry",
         "a < b > c", "5 > 3", "emoji \U0001F600 text", "ümlaut König",
         "line\nbreak", "tab\there", "", " ", "&#0;&#128;", "&lt;tag&gt;",
         "très tôt déjà", "日本語テキスト", "&quot;quoted&quot;",
         "&copyright; x", "&ampx &notit;", "&ltx; &gtq", "&nbspz",
         # CDATA sections: NOT markup to either engine (kMarkupPattern only
         # knows <!--), so they must tokenize as literal text — pins the
         # kernel-level CDATA-as-text equality the round-4 feed layer
         # builds on (tags INSIDE still tokenize; equality is the contract)
         "<![CDATA[raw & text]]>", "<![CDATA[<b>markup</b>]]>",
         "<![CDATA[unterminated", "a<![CDATA[x]]>b", "<![CDATA[]]>"]

# Full-WHATWG entity injection (incl. HTML5-only, multi-codepoint, and
# legacy-prefix-collision names) so the kernel and the independently-sourced
# entities shim can actually disagree on table coverage — the round-1 fuzz
# pool only used names both sides were guaranteed to share.
import html.entities as _he
_h5 = sorted(k[:-1] for k in _he.html5 if k.endswith(";"))
_ent_rng = random.Random(seed + 7)
TEXTS += ["&%s;" % n for n in _ent_rng.sample(_h5, 80)]
TEXTS += ["x&%s;y&%s" % (a, b)
          for a, b in zip(_ent_rng.sample(_h5, 12), _ent_rng.sample(_h5, 12))]
TEXTS += ["&NotEqualTilde; &bnequiv;", "&check;&star;&num;", "&half; &sol;",
          "&notinva;", "&timesbar; &timesb", "&centerdot; &cent",
          "&copysr;&copyZZ;", "&gtrapprox;&gtr", "&#x10FFFE;", "&#x0041;"]
ATTRS = ['id="x{i}"', "id='y{i}'", "id=z{i}", 'class="c{i} d{i}"', "class=''",
         'class=""', "href=\"https://ex.com/{i}\"", "href=/rel/{i}",
         "data-x='{i}'", "title=\"has space {i}\"", "attr='>'", "attr='/>'",
         "style=\"color:red; background:url('a.jpg')\"", "disabled",
         "value=\"\"", "a=1/2", "b=c/", '";=""', "\"random text\"", "'='",
         "xmlns:x=\"urn:{i}\"", "data-json='{{\"k\":{i}}}'", "ID=up{i}",
         'lang="en-US"', "novalue=", "weird..attr=1", "_bad=2",
         'p=ab="x<y"', '~x="p<q"', 'novalue= href="https://e.c/{i}"',
         'a=b="c/d"', 'k= l= m="v>w"',
         # entity-bearing attribute values: the reference runs html-entities
         # decode on attribute access — exercise the full-WHATWG table and
         # legacy-prefix handling through the attrs observable too
         'title="&check; &amp; x{i}"', "alt='&NotEqualTilde;&half;'",
         'data-e="&copyright; &notit; &nbspz"', 'v="&#x1F600;&#65;"',
         'w="&timesb; &times x"', 'u="&bogusname; &sol;"']


def attrs(i):
    k = rng.randint(0, 3)
    return " ".join(rng.choice(ATTRS).replace("{i}", str(i)) for _ in range(k))


def gen(depth, budget):
    out = []
    while budget[0] > 0 and rng.random() > 0.12:
        budget[0] -= 1
        r = rng.random()
        if r < 0.32:
            out.append(rng.choice(TEXTS))
        elif r < 0.40:
            c = rng.choice(["<!-- comment -->", "<!--<a></a>-->", "<!---->",
                            "<!-- unterminated", "<!--a-->", "<!DOCTYPE html>",
                            "<?xml version='1.0'?>"])
            out.append(c)
        elif r < 0.50:
            v = rng.choice(VOID)
            style = rng.random()
            if style < 0.4:
                out.append(f"<{v} {attrs(budget[0])}>")
            elif style < 0.7:
                out.append(f"<{v} {attrs(budget[0])}/>")
            else:
                out.append(f"<{v}></{v}>")
        elif r < 0.58:
            w = rng.choice(RAW)
            body = rng.choice(["var x = '<div>';", "a < b && b > c", "",
                               ".cls { color: red }", "if (x) { y(); }",
                               "unterminated raw body"])
            if rng.random() < 0.85 or body == "unterminated raw body":
                out.append(f"<{w}>{body}</{w}>")
            else:
                out.append(f"<{w}>{body}")
        else:
            t = rng.choice(TAGS)
            a = attrs(budget[0])
            inner = gen(depth + 1, budget) if depth < 6 else rng.choice(TEXTS)
            close = rng.random()
            if close < 0.72:
                out.append(f"<{t} {a}>{inner}</{t}>")
            elif close < 0.82:
                out.append(f"<{t} {a}>{inner}")  # missing close
            elif close < 0.90:
                out.append(f"<{t} {a}/>{inner}")  # self-closed
            else:
                out.append(f"<{t} {a}>{inner}</{rng.choice(TAGS)}>")  # wrong close
    return "".join(out)


for i in range(n):
    budget = [rng.randint(5, 120)]
    doc = gen(0, budget)
    if rng.random() < 0.1:
        doc = "<!DOCTYPE html><html><body>" + doc + "</body></html>"
    with open(os.path.join(outdir, f"fuzz_{i:04d}.html"), "w") as f:
        f.write(doc)

# corpus files + mutations
import shutil
ref = "/root/reference/test/html"
if os.path.isdir(ref):
    for name in sorted(os.listdir(ref)):
        data = open(os.path.join(ref, name), "rb").read().decode("utf-8", "replace")
        open(os.path.join(outdir, f"corpus_{name}.html"), "w").write(data)
        open(os.path.join(outdir, f"corpus_{name}_mut.html"), "w").write(
            data.replace("</", "<"))

# randomized selectors (parser edge cases) — shared by both runners
sel_rng = random.Random(seed + 1)
frags_tag = ["div", "p", "a", "*", "_", "my-widget", "ns:tag", "DIV", "9bad", ""]
frags_id = ["#x1", "#y-2", "#", "#!", ""]
frags_cls = [".c2", ".c2.d3", ".", ".-x", ".c2.", ""]
frags_attr = ["[href]", "[class~=\"d3\"]", "[href^='https://']", "[a=b]",
              "[a='b c']", "[x!=y]", "[t$=\".com\"]", "[u*=co]", "[lang|=en]",
              "[a=]", "[=b]", "[ a ]", "[a ]", "[]", "[a='b]", "[a=\"b\"c]",
              "[href][target=_blank]", "[a][b]", "[x][y^='h']",
              "[a=1][b]", "[id][class~=c2]", ""]
def comma_part_safe(p):
    """The REFERENCE hangs (zero-length regex match infinite loop) when a
    comma-part's position 0 parses to nothing (e.g. "9bad", "[]", "#!",
    ".[...]") — a genuine reference bug we must not trigger in differential
    runs. Our kernel handles these inputs gracefully (skips the part).
    """
    p = p.strip()
    if not p:
        return True
    c = p[0]
    if c.isalpha() or c in "_*":
        return True
    if c in "#." and len(p) > 1 and (p[1].isalnum() or p[1] in "_-"):
        return True
    if c == "[":
        j = p.find("]")
        return j > 1
    return False


sels = set()
while len(sels) < 60:
    n_parts = sel_rng.randint(1, 3)
    parts = []
    for _ in range(n_parts):
        p = (sel_rng.choice(frags_tag) + sel_rng.choice(frags_id)
             + sel_rng.choice(frags_cls) + sel_rng.choice(frags_attr))
        if p:
            parts.append(p)
    if not parts:
        continue
    sel = " ".join(parts)
    if sel_rng.random() < 0.25:
        sel = sel + ", " + sel_rng.choice(frags_tag + frags_cls[:2])
    if not all(comma_part_safe(x) for x in sel.split(",")):
        sel = "div " + sel.replace(",", ", div")
    if all(comma_part_safe(x) for x in sel.split(",")):
        sels.add(sel)
with open(os.path.join(outdir, "selectors.txt"), "w") as f:
    f.write("\n".join(sorted(sels)))

print(f"wrote {len(os.listdir(outdir))} files to {outdir}")
