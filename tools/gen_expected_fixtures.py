#!/usr/bin/env python3
"""Generate expected-value parquet fixtures for the non-SQL-expressible
sketches, so q16 (simhash) and q33 (winnowing) get FULL rows+schema+hash
oracle checks instead of rows-only.

The sketch fixtures (minhash bands, simhash, winnowing, langid) are
INDEPENDENT reimplementations (pure Python) of the same public
constructions the Scala side implements — FNV-1a/64 over UTF-16 code units,
64-bit SimHash with unit weights, Rabin-Karp rolling hash (B=1000003,
window=16) + winnowing (guarantee=8, first-seen order, deduped). Any drift
between the two implementations shows up as a hash mismatch in the driver's
DuckDB compare.

The q18 LSH fixture is DIFFERENT in kind: it is a bit-exact PORT of
Similarity.lshTopK (same hyperplane constants, float32-product/double-fold
accumulation, HALF_UP rounding), so it is a regression PIN, not independent
verification — a bug shared by both sides would survive it. The independent
quality evidence for q18 is the ScalaTest recall check against the exact
brute-force scan (PipelineSpec "lshTopK recall vs the exact scan").

Fixtures are keyed by md5(text) — not doc_id — so one fixture covers every
scale factor whose documents appear here (sf0.001/sf0.01/sf0.1 by default).

Usage: gen_expected_fixtures.py [sfDir ...]
Writes tools/fixtures/{simhash,winnow}_expected.parquet
"""
import sys, os, hashlib, re, zlib

import duckdb

MASK = (1 << 64) - 1


def to_signed(x):
    x &= MASK
    return x - (1 << 64) if x >= (1 << 63) else x


def utf16_units(s):
    b = s.encode("utf-16-le")
    return [b[i] | (b[i + 1] << 8) for i in range(0, len(b), 2)]


def fnv1a64(units):
    h = 0xcbf29ce484222325
    for u in units:
        h = ((h ^ u) * 0x100000001b3) & MASK
    return h


# Java `text.split("\\s+")`: ASCII whitespace class, trailing empty strings
# removed, leading empty kept; "" splits to [""]
_JWS = re.compile(r"[ \t\n\x0b\f\r]+")


def java_split_ws(text):
    if text == "":
        return [""]
    parts = _JWS.split(text)
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def simhash(text):
    counts = [0] * 64
    for tok in java_split_ws(text):
        h = fnv1a64(utf16_units(tok))
        for bit in range(64):
            if (h >> bit) & 1:
                counts[bit] += 1
            else:
                counts[bit] -= 1
    out = 0
    for bit in range(64):
        if counts[bit] > 0:
            out |= 1 << bit
    return to_signed(out)


def rolling_hashes(text, window=16):
    units = utf16_units(text)
    if len(units) < window:
        return [to_signed(fnv1a64(units))]
    B = 1000003
    pow_ = 1
    for _ in range(window - 1):
        pow_ = (pow_ * B) & MASK
    h = 0
    for i in range(window):
        h = (h * B + units[i]) & MASK
    out = [h]
    for i in range(window, len(units)):
        h = ((h - units[i - window] * pow_) * B + units[i]) & MASK
        out.append(h)
    return [to_signed(x) for x in out]


def winnow(hashes, guarantee=8):
    if not hashes:
        return []
    if len(hashes) <= guarantee:
        return [min(hashes)]
    seen, out = set(), []
    for i in range(len(hashes) - guarantee + 1):
        m = min(hashes[i:i + guarantee])
        if m not in seen:
            seen.add(m)
            out.append(m)
    return out


def winnow_positions(hashes, guarantee=8):
    """Leftmost-min winnowing selection WITH positions (independent port of
    TextAnalysis.winnowPositions): same per-window choice as winnow() so the
    value set is identical; (pos, hash) pairs deduped, same hash at two
    positions kept. Drives the q88 span-REMOVAL oracle."""
    if not hashes:
        return []
    if len(hashes) <= guarantee:
        mj = 0
        for j in range(1, len(hashes)):
            if hashes[j] < hashes[mj]:
                mj = j
        return [(mj, hashes[mj])]
    seen, out = set(), []
    for i in range(len(hashes) - guarantee + 1):
        mj = i
        for j in range(i + 1, i + guarantee):
            if hashes[j] < hashes[mj]:
                mj = j
        if (mj, hashes[mj]) not in seen:
            seen.add((mj, hashes[mj]))
            out.append((mj, hashes[mj]))
    return out


_BPEISH = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+|\s+"


def bpe_train(vocab, n_merges):
    """Independent BPE trainer over (token -> corpus count): iterated
    argmax (count desc, then lexicographically smallest pair) + left-to-
    right non-overlapping rewrite, stopping when the best pair count < 2.
    Mirrors TextAnalysis.bpeTrain for the q94 corpus-keyed fixture."""
    words = [([c for c in t], n) for t, n in vocab.items()]
    merges = []
    for idx in range(n_merges):
        counts = {}
        for syms, n in words:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((idx, l, r, cnt))
        new_words = []
        for syms, n in words:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == l and syms[j + 1] == r:
                    out.append(l + r)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new_words.append((out, n))
        words = new_words
    return merges


def mix64(z):
    z &= MASK
    z ^= z >> 33
    z = (z * 0xff51afd7ed558ccd) & MASK
    z ^= z >> 33
    z = (z * 0xc4ceb9fe1a85ec53) & MASK
    z ^= z >> 33
    return z


def minhash_bands(text, num_hashes=32, bands=8):
    rows = num_hashes // bands
    toks = set(java_split_ws(text))
    seeds = [mix64(((i + 1) * 0x9E3779B97F4A7C15) & MASK) for i in range(num_hashes)]
    sig = [MASK] * num_hashes  # unsigned max; mins compared unsigned
    for t in toks:
        x = fnv1a64(utf16_units(t))
        for i in range(num_hashes):
            v = mix64(x ^ seeds[i])
            if v < sig[i]:
                sig[i] = v
    out = []
    for b in range(bands):
        h = 0xcbf29ce484222325
        for r in range(rows):
            h = ((h ^ sig[b * rows + r]) * 0x100000001b3) & MASK
        out.append((b, to_signed(h)))
    return out


# ---- language-ID heuristic (independent port of TextAnalysis.langIdOf) ----

_STOPWORDS = [  # same order as the Scala Vector (ties -> earlier wins);
    # non-ASCII \u-escaped to pin the exact NFC codepoints the JVM matches
    ("en", {"the", "of", "and", "to", "in", "is", "it", "that", "was", "for", "with", "his", "her", "this", "are", "not", "you"}),
    ("fr", {"le", "la", "les", "de", "des", "et", "un", "une", "du", "en", "est", "que", "pour", "dans", "qui", "pas", "sur"}),
    ("es", {"el", "la", "los", "las", "de", "y", "un", "una", "del", "en", "es", "que", "por", "para", "con", "no", "se"}),
    ("de", {"der", "die", "das", "und", "ein", "eine", "von", "zu", "mit", "ist", "den", "nicht", "auf", "sich", "des", "im", "f\u00fcr"}),
    ("pt", {"n\u00e3o", "s\u00e3o", "uma", "os", "das", "dos", "em", "por", "com", "mais", "foi", "como", "mas", "seu", "sua"}),
    ("it", {"il", "gli", "che", "di", "per", "non", "sono", "della", "nel", "alla", "come", "anche", "pi\u00f9", "questo", "questa"}),
    ("nl", {"het", "een", "van", "dat", "die", "niet", "met", "voor", "zijn", "ook", "maar", "naar", "heeft", "wordt", "deze"}),
    ("pl", {"w", "na", "z", "do", "nie", "si\u0119", "jest", "jak", "ale", "czy", "tak", "dla", "przez", "ju\u017c", "tylko"}),
    ("tr", {"ve", "bir", "bu", "i\u00e7in", "ile", "gibi", "daha", "\u00e7ok", "olarak", "ama", "kadar", "sonra", "olan", "ben"}),
    ("sv", {"och", "att", "det", "som", "\u00e4r", "p\u00e5", "av", "f\u00f6r", "med", "till", "den", "har", "inte", "om", "ett"}),
    ("vi", {"v\u00e0", "c\u1ee7a", "l\u00e0", "c\u00f3", "kh\u00f4ng", "\u0111\u01b0\u1ee3c", "trong", "\u0111\u00e3", "ng\u01b0\u1eddi", "m\u1ed9t", "cho", "v\u1edbi", "nh\u1eefng", "n\u00e0y"}),
    ("id", {"yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini", "dari", "dalam", "akan", "pada", "juga", "saya", "ke"}),
]

import unicodedata


def lang_id(text):
    if not text:
        return "und"
    han = kana = hangul = cyr = letters = 0
    for u in utf16_units(text):  # UTF-16 units, like the JVM charAt loop
        if 0xD800 <= u <= 0xDFFF:
            continue  # lone surrogate: not a letter to Character.isLetter
        c = chr(u)
        if unicodedata.category(c).startswith("L"):
            letters += 1
            if 0x4E00 <= u <= 0x9FFF:
                han += 1
            elif 0x3040 <= u <= 0x30FF:
                kana += 1
            elif 0xAC00 <= u <= 0xD7AF:
                hangul += 1
            elif 0x0400 <= u <= 0x04FF:
                cyr += 1
    if letters == 0:
        return "und"
    cjk = han + kana + hangul
    if cjk * 3 > letters:
        if kana * 10 >= cjk:
            return "ja"
        if hangul * 2 >= cjk:
            return "ko"
        return "zh"
    if cyr * 3 > letters:
        return "ru"
    toks = re.findall(r"[^\W\d_]+", text.lower())
    best, best_score = "und", 0
    for lang, sw in _STOPWORDS:
        score = sum(1 for t in toks if t in sw)
        if score > best_score:
            best_score, best = score, lang
    return best


# ---- LSH ANN (bit-exact port of Similarity.lshTopK for the q18 oracle) ----

import math
import numpy as np
from decimal import Decimal, ROUND_HALF_UP

_LMAX = float(9223372036854775807)


def _plane_weights(n_planes, dims):
    """planeWeight(plane, dim): mix of two 64-bit constants -> [-1, 1) float32.
    Long->double conversion is round-half-even in both JVM and CPython."""
    w = np.empty((n_planes, dims), dtype=np.float32)
    for p in range(n_planes):
        for d in range(dims):
            x = (p * 0x9E3779B97F4A7C15 + d * 0xC2B2AE3D27D4EB4F) & MASK
            x ^= x >> 33
            x = (x * 0xFF51AFD7ED558CCD) & MASK
            x ^= x >> 33
            w[p, d] = np.float32(float(to_signed(x)) / _LMAX)
    return w


def _foldl_sum(products32):
    """Sequential left-fold double accumulation (Spark `aggregate` order —
    NOT numpy pairwise summation)."""
    acc = 0.0
    for v in products32:
        acc += float(v)
    return acc


def _signature(v32, w):
    sig = 0
    for p in range(w.shape[0]):
        if _foldl_sum((v32 * w[p]).astype(np.float32)) >= 0:
            sig |= 1 << p
    return sig


def _cos_col(a32, b32, na, nb):
    """Similarity.cosineCol: float32 products, double left-fold, double sqrt."""
    if na == 0.0 or nb == 0.0:
        return 0.0
    ab = _foldl_sum((a32 * b32).astype(np.float32))
    return ab / math.sqrt(na * nb)


def _round4(x):
    """Spark round(col, 4) on DoubleType = BigDecimal.valueOf(x) (which goes
    through Double.toString's SHORTEST decimal repr) then HALF_UP at scale 4.
    Decimal(repr(x)) reproduces that; Decimal(x) (exact binary expansion)
    diverges on ~5% of 5-decimal half boundaries (e.g. 0.00015)."""
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


def lsh_topk(vecs, n_queries=8, k=3, n_planes=8, n_probes=4):
    """vecs: dict vec_id -> np.float32 array. Returns (query_id, rank,
    neighbor_id) rows identical to Similarity.lshTopK's output."""
    dims = len(next(iter(vecs.values())))
    w = _plane_weights(n_planes, dims)
    sig = {i: _signature(v, w) for i, v in vecs.items()}
    norm = {i: _foldl_sum((v * v).astype(np.float32)) for i, v in vecs.items()}
    by_bucket = {}
    for i, s in sig.items():
        by_bucket.setdefault(s, []).append(i)
    out = []
    for q in sorted(vecs):
        if q >= n_queries:
            continue
        probes = [sig[q]] + [sig[q] ^ (1 << p) for p in range(min(n_probes, n_planes))]
        seen_probe = set()
        cand = set()
        for b in probes:
            if b in seen_probe:
                continue
            seen_probe.add(b)
            for n in by_bucket.get(b, ()):
                if n != q:
                    cand.add(n)
        scored = set()
        for n in cand:
            c = _round4(_cos_col(vecs[q], vecs[n], norm[q], norm[n]))
            scored.add((n, c))  # dropDuplicates(query_id, neighbor_id, c)
        ranked = sorted(scored, key=lambda t: (-t[1], t[0]))
        for rank, (n, _) in enumerate(ranked[:k], start=1):
            out.append((q, rank, n))
    return out


def main():
    sfdirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
                              "/root/testdata/sf0.1"]
    texts = {}
    con = duckdb.connect()
    for d in sfdirs:
        p = f"{d}/documents.parquet"
        if not os.path.exists(p):
            continue
        for (t,) in con.execute(f"SELECT text FROM '{p}'").fetchall():
            texts[hashlib.md5(t.encode()).hexdigest()] = t
    sim_rows, win_rows, band_rows, lang_rows, zl_rows = [], [], [], [], []
    pos_rows = []
    for md, t in sorted(texts.items()):
        sim_rows.append((md, simhash(t)))
        for fp in winnow(rolling_hashes(t)):
            win_rows.append((md, fp))
        for p, fp in winnow_positions(rolling_hashes(t)):
            pos_rows.append((md, p, fp))
        for b, h in minhash_bands(t):
            band_rows.append((md, b, h))
        lang_rows.append((md, lang_id(t)))
        # zlib level 6 bytes are IDENTICAL between CPython zlib and the JVM
        # Deflater (both wrap the same zlib algorithm with default
        # strategy/memLevel — verified byte-for-byte), so the compression
        # ratio gets a FULL hash oracle, not a band check
        raw = t.encode()
        zl_rows.append((md, len(raw), len(zlib.compress(raw, 6))))
    outdir = os.path.join(os.path.dirname(__file__), "fixtures")
    os.makedirs(outdir, exist_ok=True)
    con.execute("CREATE TABLE sim(text_md5 VARCHAR, simhash BIGINT)")
    con.executemany("INSERT INTO sim VALUES (?, ?)", sim_rows)
    con.execute(f"COPY sim TO '{outdir}/simhash_expected.parquet' (FORMAT PARQUET)")
    con.execute("CREATE TABLE win(text_md5 VARCHAR, fingerprint BIGINT)")
    con.executemany("INSERT INTO win VALUES (?, ?)", win_rows)
    con.execute(f"COPY win TO '{outdir}/winnow_expected.parquet' (FORMAT PARQUET)")
    con.execute("CREATE TABLE winpos(text_md5 VARCHAR, pos INT, fingerprint BIGINT)")
    con.executemany("INSERT INTO winpos VALUES (?, ?, ?)", pos_rows)
    con.execute(f"COPY winpos TO '{outdir}/winnow_pos_expected.parquet' (FORMAT PARQUET)")
    con.execute("CREATE TABLE mb(text_md5 VARCHAR, band INT, bucket BIGINT)")
    con.executemany("INSERT INTO mb VALUES (?, ?, ?)", band_rows)
    con.execute(f"COPY mb TO '{outdir}/minhash_bands_expected.parquet' (FORMAT PARQUET)")
    con.execute("CREATE TABLE lg(text_md5 VARCHAR, lang_guess VARCHAR)")
    con.executemany("INSERT INTO lg VALUES (?, ?)", lang_rows)
    con.execute(f"COPY lg TO '{outdir}/langid_expected.parquet' (FORMAT PARQUET)")
    con.execute("CREATE TABLE zl(text_md5 VARCHAR, raw_len BIGINT, compressed_len BIGINT)")
    con.executemany("INSERT INTO zl VALUES (?, ?, ?)", zl_rows)
    con.execute(f"COPY zl TO '{outdir}/zlib_expected.parquet' (FORMAT PARQUET)")
    # BPE merge sequences, keyed by a vocabulary digest the oracle
    # recomputes from its own regexp-token view (the q50 construction):
    # md5(string_agg(token:n, '|' ORDER BY token)), minCount=5, 8 merges
    bpe_rows = []
    for d in sfdirs:
        p = f"{d}/documents.parquet"
        if not os.path.exists(p):
            continue
        counts = {}
        for (t,) in con.execute(f"SELECT text FROM '{p}'").fetchall():
            for tok in re.findall(_BPEISH, t, re.ASCII):
                if not re.fullmatch(r"\s+", tok, re.ASCII):
                    counts[tok] = counts.get(tok, 0) + 1
        vocab = {t: n for t, n in counts.items() if n >= 5}
        key_src = "|".join("%s:%d" % (t, vocab[t]) for t in sorted(vocab))
        corpus_md5 = hashlib.md5(key_src.encode()).hexdigest()
        for idx, l, r, cnt in bpe_train(vocab, 8):
            bpe_rows.append((corpus_md5, idx, l, r, cnt))
    con.execute("CREATE TABLE bpe(corpus_md5 VARCHAR, merge_idx INT, "
                "lhs VARCHAR, rhs VARCHAR, pair_count BIGINT)")
    con.executemany("INSERT INTO bpe VALUES (?, ?, ?, ?, ?)", bpe_rows)
    con.execute(f"COPY bpe TO '{outdir}/bpe_merges_expected.parquet' (FORMAT PARQUET)")

    # LSH ANN expected values, keyed by a corpus digest the oracle recomputes
    # from its own embeddings view (same count across SFs, different vectors)
    lsh_rows = []
    for d in sfdirs:
        p = f"{d}/embeddings.parquet"
        if not os.path.exists(p):
            continue
        corpus_md5 = con.execute(
            "SELECT md5(string_agg(cast(embedding AS varchar), '|' ORDER BY vec_id)) "
            f"FROM '{p}'").fetchone()[0]
        vecs = {vid: np.array(emb, dtype=np.float32) for vid, emb in
                con.execute(f"SELECT vec_id, embedding FROM '{p}'").fetchall()}
        for q, rank, n in lsh_topk(vecs):
            lsh_rows.append((corpus_md5, q, rank, n))
    con.execute("CREATE TABLE lsh(corpus_md5 VARCHAR, query_id BIGINT, "
                "rank INT, neighbor_id BIGINT)")
    con.executemany("INSERT INTO lsh VALUES (?, ?, ?, ?)", lsh_rows)
    con.execute(f"COPY lsh TO '{outdir}/lsh_topk_expected.parquet' (FORMAT PARQUET)")
    print("wrote %s: %d texts, %d simhash, %d winnow, %d band, %d langid, "
          "%d lsh rows" % (outdir, len(texts), len(sim_rows), len(win_rows),
                           len(band_rows), len(lang_rows), len(lsh_rows)))


if __name__ == "__main__":
    main()
