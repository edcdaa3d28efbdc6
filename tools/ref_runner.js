#!/usr/bin/env node
// Differential-test runner over the transpiled reference engine.
// Usage: node ref_runner.js <inputDir> <out.json>
// Emits one JSON record per (file, optionSet) with md5 fingerprints of every
// observable kernel output.
const fs = require('fs');
const path = require('path');
const crypto = require('crypto');
const { parse, Matcher } = require('/tmp/ref_js/reference.js');

const md5 = s => crypto.createHash('md5').update(Buffer.from(s, 'utf8')).digest('hex');

const OPTION_SETS = [
  ['default', {}],
  ['comment', { comment: true }],
  ['all', { comment: true, script: true, style: true, pre: true }],
  ['lower', { lowerCaseTagName: true }],
];

const SELECTORS = ['div', 'p', 'a', 'span', '#x1', '.c2', 'div p', '[href]',
  '[class~="d3"]', 'a[href^="https://"]', 'li', '*', 'div, span', '#x1 span',
  '[attr=">"]', 'ul li', 'td', 'my-widget', 'ns:tag', '[id]'];

function record(file, data) {
  const out = [];
  for (const [oname, opts] of OPTION_SETS) {
    const rec = { file, opts: oname };
    try {
      const root = parse(data, opts);
      rec.valid = root.valid;
      rec.outer = md5(root.toString());
      rec.structured = md5(root.structuredText);
      rec.text = md5(root.text);
      rec.rawText = md5(root.rawText);
      rec.structure = md5(root.structure);
      rec.json = md5(JSON.stringify(root.toJSON()));
      // selector results: per selector, count + md5 of joined outerHTMLs
      rec.sel = {};
      for (const s of SELECTORS) {
        const all = root.querySelectorAll(s);
        const first = root.querySelector(s);
        rec.sel[s] = [all.length,
          md5(all.map(e => e.toString()).join(' ')),
          first ? md5(first.toString()) : 'null'];
      }
      // mutation path: removeWhitespace on a fresh parse, then serialize
      const r2 = parse(data, opts);
      r2.removeWhitespace();
      rec.removeWs = md5(r2.toString());
      // first element's attribute maps
      const firstEl = root.childNodes.find(c => c.nodeType === 1);
      if (firstEl) {
        rec.attrs = md5(JSON.stringify(firstEl.attributes));
        rec.rawAttrs = md5(JSON.stringify(firstEl.rawAttributes));
        rec.idClass = md5(firstEl.id + ' ' + firstEl.classNames.join(','));
      }
      // mutation chain on a fresh parse: setAttribute / removeAttribute /
      // innerHTML= / set_content / trimRight, then serialize
      const r3 = parse(data, opts);
      const el3 = r3.childNodes.find(c => c.nodeType === 1);
      if (el3) {
        el3.setAttribute('data-mut', 'v<&"1');
        el3.setAttribute('id', 'mut-id');
        el3.setAttribute('bare', '');
        el3.removeAttribute('class');
        rec.mutAttr = md5(r3.toString() + '|' + el3.id + '|' + el3.classNames.join(','));
        el3.innerHTML = '<p class="q">rep &amp; laced</p>';
        rec.mutInner = md5(r3.toString());
        el3.set_content('plain text only');
        rec.mutContent = md5(r3.toString());
      }
      const r4 = parse(data, opts);
      r4.trimRight(/[aeiou]/);
      rec.mutTrim = md5(r4.toString());
    } catch (e) {
      rec.error = String(e).slice(0, 200);
    }
    out.push(rec);
  }
  return out;
}

const [dir, outPath] = process.argv.slice(2);
const selFile = path.join(dir, 'selectors.txt');
if (fs.existsSync(selFile)) {
  for (const s of fs.readFileSync(selFile).toString().split('\n'))
    if (s) SELECTORS.push(s);
}
const results = [];
for (const f of fs.readdirSync(dir).sort()) {
  if (!f.endsWith('.html')) continue;
  const data = fs.readFileSync(path.join(dir, f)).toString();
  results.push(...record(f, data));
}
fs.writeFileSync(outPath, JSON.stringify(results));
console.log(`wrote ${results.length} records to ${outPath}`);
