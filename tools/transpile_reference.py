#!/usr/bin/env python3
"""Build a runnable JS copy of the reference engine in /tmp for differential
testing. The repo ships only this TRANSFORMER — the reference source stays in
its read-only checkout and the transpiled artifact lives outside the repo
(no reference code is copied into the repo).

TS→JS transforms (the reference uses only erasable typing plus three
non-erasable constructs: enum, ctor parameter properties, overload sigs).

Usage: transpile_reference.py [outdir]  (default /tmp/ref_js)
"""
import re, sys, os

SRC = "/root/reference/src/index.ts"
out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ref_js"
os.makedirs(out, exist_ok=True)
s = open(SRC).read()

# 1. import of html-entities -> local shim (CommonJS)
s = s.replace("import { decode, encode } from 'html-entities';",
              "const { decode, encode } = require('./entities_shim.js');")

# 2. enum NodeType
s = re.sub(r"export enum NodeType \{[^}]*\}",
           "const NodeType = { ELEMENT_NODE: 1, TEXT_NODE: 3, COMMENT_NODE: 8 };",
           s)

# 3. type aliases / interfaces -> delete whole declarations (block forms
# first, then single-line aliases that don't open a block)
s = re.sub(r"^export type ParsingOptions = \{[^}]*\}", "", s, flags=re.M | re.S)
s = re.sub(r"^export interface \w+ \{[^}]*\}", "", s, flags=re.M | re.S)
s = re.sub(r"^export type \w+ = [^;{]*;?$", "", s, flags=re.M)
s = re.sub(r"^type \w+ = [^;{]*;?$", "", s, flags=re.M)

# 4. constructor parameter properties (HTMLElement only)
s = s.replace(
    "constructor(public tagName: string, private rawAttrs = '', parentNode = null as HTMLElement | null) {\n\t\tsuper();",
    "constructor(tagName, rawAttrs = '', parentNode = null) {\n\t\tsuper();\n\t\tthis.tagName = tagName;")
# (`this.rawAttrs = rawAttrs;` already exists in the body)

# 5. overload signatures (declaration lines ending in ';' for querySelectorImpl)
s = re.sub(r"^\tprivate querySelectorImpl\(matcher: Matcher, all: (?:true|false)\): [^;]*;$",
           "", s, flags=re.M)
s = re.sub(r"^\t\tfunction explore\(node: HTMLElement, currentMatcher: Matcher, all: (?:true|false)\): [^\n]*$",
           "", s, flags=re.M)

# 6. abstract members (bare declarations) -> delete; abstract keyword -> strip
s = re.sub(r"^\tabstract [^\n]*$", "", s, flags=re.M)
s = re.sub(r"\babstract class\b", "class", s)

# 7. bare typed field declarations (no initializer). Only `value: string`
# exists in the reference (TextNode/CommentNode); a generic pattern would
# mangle object-literal entries like `br: true`.
s = re.sub(r"^(\t)value: string$", r"\1value;", s, flags=re.M)
s = re.sub(r"^(\t)(?:private |public |readonly )+(\w+): [\w\[\]<>| ]+;?$", r"\1\2;", s, flags=re.M)

# 8. `as X` casts (incl. `as unknown as Y`, `as keyof typeof options`, `as const`)
s = re.sub(r" as \{[^}]*\}", "", s)  # object-type casts
s = re.sub(r" as keyof typeof \w+", "", s)
s = re.sub(r" as keyof \w+", "", s)
# intersection-type casts (nested braces — handled as exact literals first)
s = s.replace("[] as string[] & { prependWhitespace?: boolean };", "[];")
s = s.replace("{} as Attributes & { [Symbol.iterator]?: () => Iterator<{ name: string; value: string }> };", "{};")
s = s.replace("new HTMLElement('') as HTMLElement & { valid: boolean; };", "new HTMLElement('');")
for _ in range(3):
    s = re.sub(r" as (?:unknown|const|any|'[^']*'|[\w.]+(?:<[^>]*>)?(?:\[\])?(?: \| \w+)*)", "", s)

# 9. type annotations on params/vars/returns. Param annotations are stripped
# only for KNOWN type names (a generic `\w+: ...` regex would eat object
# literal entries like `value: this.value`).
s = re.sub(
    r"createCheckerFromParsed\(parsed: \{.*?\}\): \(el: HTMLElement\) => boolean \{",
    "createCheckerFromParsed(parsed) {", s, flags=re.S)
s = re.sub(r"isBlock\(node: \{[^}]*\}\)", "isBlock(node)", s)
s = re.sub(r"\): Array<\{[^}]*\}> \{", ") {", s)
TYPE = (r"(?:string|boolean|number|RegExpExecArray|RegExp|Matcher|HTMLElement|"
        r"Node|TextNode|CommentNode|Attributes|RawAttributes|KeyAttributes|"
        r"ParsingOptions|T)(?!\w)")
s = re.sub(r"(\w+)\??: " + TYPE + r"(?:\[\])?(?: \| (?:" + TYPE +
           r"(?:\[\])?|undefined|null))*", r"\1", s)
# return types — TS style here is `): Type {` with no space before ':'
# (a ternary like `) : false` must NOT match); includes function-type
# returns like `): Array<(el) => boolean> {`
s = re.sub(r"\): Array<\([\w, ]*\) => [\w\[\]|. ]+> \{", ") {", s)
s = re.sub(r"\): \([\w, ]*\) => [\w\[\]|. ]+ \{", ") {", s)
s = re.sub(r"\): [\w\[\]<>|. ]+(?:<[^>]*>)? \{", ") {", s)
s = re.sub(r"\): [\w\[\]<>|. ]+(?:<[^>]*>)?;", ");", s)
# generics on functions/methods
s = re.sub(r"(\w+)<T extends [^>]*>\(", r"\1(", s)
s = re.sub(r"(\w+)<T>\(", r"\1(", s)
# typed local declarations: `const attrs: T = ...` / `let match: X | null;`
# (type may include function types like Array<(element) => boolean>)
s = re.sub(r"\b(const|let|var) (\w+): [\w\[\]<>|. {}:;'(),=>]+? =(?!>)", r"\1 \2 =", s)
s = re.sub(r"\b(const|let|var) (\w+): [\w\[\]<>|. ]+;", r"\1 \2;", s)
# class property with init + type: `private checkers: Array<...> = [];`
s = re.sub(r"^(\t)(?:private |public |readonly )*(\w+): [\w\[\]<>(=)|. {}:;']*= ", r"\1\2 = ", s, flags=re.M)
# visibility modifiers on methods/fields
s = re.sub(r"^(\t+)(?:public|private|protected) ", r"\1", s, flags=re.M)

# 10. non-null assertions `!` (after ], ), or identifier, before . ( ; , ) )
s = re.sub(r"(\]|\)|\w)!(\.|\(|;|,|\))", r"\1\2", s)

# 11. `export` -> module.exports collected at the end
s = re.sub(r"^export ", "", s, flags=re.M)
s += "\nmodule.exports = { NodeType, TextNode, CommentNode, HTMLElement, Matcher, parse, isBlock };\n"

# 12. leftover generic type args in `new Set<...>`/Array<...> casts
s = re.sub(r"new Set<[^>]*>", "new Set", s)
s = re.sub(r"\(Symbol\.iterator\)", "(Symbol.iterator)", s)

open(os.path.join(out, "reference.js"), "w").write(s)
print(f"wrote {out}/reference.js ({len(s)} chars)")
