#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare row count, schema (column names
sorted), and values against the Verify parquet dump."""
import duckdb, glob, json, math, os, sys
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(d for d in os.listdir(outdir) if os.path.isdir(f"{outdir}/{d}"))
fails = []
for name in names:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no parquet written")); continue
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    if name not in oracle:
        print(f"{name:28s} rows-only: {len(got)} rows")
        if len(got) == 0: fails.append((name, "rows-only but 0 rows"))
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}")); continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        fails.append((name, f"schema mismatch: got {gc} vs oracle {ec}")); continue
    if len(got) != len(exp):
        fails.append((name, f"rowcount {len(got)} vs {len(exp)}")); continue
    got, exp = got[gc], exp[gc]
    bad = None
    for c in gc:
        gv, ev = got[c].tolist(), exp[c].tolist()
        for i, (a, b) in enumerate(zip(gv, ev)):
            if a is None and b is None: continue
            try:
                if pd.isna(a) and pd.isna(b): continue
            except (TypeError, ValueError): pass
            eq = (a == b)
            if hasattr(eq, "all"): eq = bool(eq.all())
            if not eq:
                bad = f"col {c} row {i}: spark={a!r} oracle={b!r}"; break
        if bad: break
    if bad: fails.append((name, bad))
    else: print(f"{name:28s} OK ({len(got)} rows)")
print()
if fails:
    print(f"{len(fails)} FAILURES:")
    for n, m in fails: print(f"  {n}: {m}")
    sys.exit(1)
print("ALL MATCH")
