#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf-dir parquet tables, compare against the Spark result
parquet dumped by graft.Verify. Columns sorted by name, rows compared as
values (exact; floats reported with max-abs-diff when not exact)."""
import sys, os, json, glob
import duckdb, pandas as pd, numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name in sorted(oracle):
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails.append(name); continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails.append(name); continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    ec, gc = sorted(exp.columns), sorted(got.columns)
    if ec != gc:
        print(f"FAIL {name}: columns {gc} vs oracle {ec}"); fails.append(name); continue
    exp, got = exp[ec], got[ec]
    if len(exp) != len(got):
        print(f"FAIL {name}: rows {len(got)} vs oracle {len(exp)}"); fails.append(name); continue
    ok = True
    for c in ec:
        e, g = exp[c], got[c]
        if pd.api.types.is_float_dtype(e) or pd.api.types.is_float_dtype(g):
            e = e.astype(float); g = g.astype(float)
            same = ((e.isna() & g.isna()) | (e == g))
            if not same.all():
                d = np.nanmax(np.abs(e - g))
                print(f"FAIL {name}: col {c} float mismatch {int((~same).sum())} rows, maxdiff={d}")
                ok = False
        else:
            es = e.map(lambda x: None if pd.isna(x) else str(x))
            gs = g.map(lambda x: None if pd.isna(x) else str(x))
            same = es.eq(gs) | (es.isna() & gs.isna())
            if not same.all():
                i = int(same.idxmin())
                print(f"FAIL {name}: col {c} mismatch {int((~same).sum())} rows, first at {i}: got={gs[i]!r} exp={es[i]!r}")
                ok = False
    if ok: print(f"PASS {name} ({len(exp)} rows)")
    else: fails.append(name)
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} pass; fails: {fails}")
sys.exit(1 if fails else 0)
