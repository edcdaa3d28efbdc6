#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate: for each query
parquet written by graft.Verify, run the matching oracle SQL in DuckDB over
the same sf tables and compare column names (sorted), row counts, and a
value hash over sorted stringified rows.

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import duckdb, json, sys, hashlib, os

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and v == int(v):
                v = int(v)
            if isinstance(v, bool):
                v = str(v).lower()
            vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    h = hashlib.md5("\x1e".join(out).encode()).hexdigest()
    return h, out

fails = 0
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    rel = con.sql(f"SELECT * FROM '{d}/*.parquet'")
    scols = [c.lower() for c in rel.columns]
    srows = rel.fetchall()
    if name not in oracles:
        print(f"  {name}: NO-ORACLE rows={len(srows)} ({'ok' if srows else 'EMPTY!'})")
        if not srows and name != 'q26_corpus_golden':
            fails += 1
        continue
    orel = con.sql(oracles[name])
    ocols = [c.lower() for c in orel.columns]
    orows = orel.fetchall()
    sh, sc = canon(srows, scols)
    oh, oc = canon(orows, ocols)
    ok_cols = sorted(scols) == sorted(ocols)
    ok_rows = len(srows) == len(orows)
    ok_hash = sh == oh
    status = "OK" if (ok_cols and ok_rows and ok_hash) else "MISMATCH"
    if status != "OK":
        fails += 1
        print(f"  {name}: {status} cols={ok_cols} rows={len(srows)}/{len(orows)} hash={ok_hash}")
        if ok_cols and not ok_hash:
            sset, oset = set(sc), set(oc)
            for x in list(sset - oset)[:3]:
                print(f"    spark-only: {x[:160]}")
            for x in list(oset - sset)[:3]:
                print(f"    oracle-only: {x[:160]}")
        if not ok_cols:
            print(f"    spark cols: {sorted(scols)}")
            print(f"    oracle cols: {sorted(ocols)}")
    else:
        print(f"  {name}: OK rows={len(srows)}")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
