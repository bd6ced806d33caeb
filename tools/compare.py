#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
parquet vs DuckDB oracle on the same sf dir. Usage:
  python3 tools/compare.py <sfdir> <verify_outdir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path):
        continue
    files = glob.glob(f"{path}/*.parquet")
    got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
    if name not in oracles:
        print(f"{name}: NO-ORACLE rows={len(got)}")
        continue
    try:
        exp = con.sql(oracles[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE-ERROR {e}")
        fail += 1
        continue
    # driver-style: sort columns by name, then compare values
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    status = []
    if list(got.columns) != list(exp.columns):
        status.append(f"SCHEMA got={list(got.columns)} exp={list(exp.columns)}")
    if len(got) != len(exp):
        status.append(f"ROWS got={len(got)} exp={len(exp)}")
    if not status:
        g = got.reset_index(drop=True)
        e = exp.reset_index(drop=True)
        # normalize dtypes for compare (dates, decimals)
        for c in g.columns:
            gc, ec = g[c], e[c]
            if str(gc.dtype) != str(ec.dtype):
                try:
                    gc = gc.astype("object").astype(str)
                    ec = ec.astype("object").astype(str)
                except Exception:
                    pass
            neq = ~((gc == ec) | (gc.isna() & ec.isna()))
            if neq.any():
                i = neq.idxmax()
                status.append(f"VALUES col={c} row={i} got={gc[i]!r} exp={ec[i]!r} ({int(neq.sum())} diffs)")
    print(f"{name}: {'OK rows=' + str(len(got)) if not status else 'FAIL ' + '; '.join(status)}")
    if status:
        fail += 1
sys.exit(1 if fail else 0)
