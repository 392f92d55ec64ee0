#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate (NOT part of the
library): reads Verify output (parquet per query + oracle_sql.json), runs
each oracle in DuckDB over the same fixture dir, and compares results with
columns sorted by name and rows sorted by all columns."""
import json, sys, glob, os
import duckdb

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad = [], []
for name in sorted(oracle):
    try:
        exp = con.sql(oracle[name]).df()
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            bad.append((name, f"cols exp={list(exp.columns)} got={list(got.columns)}"))
            continue
        # normalize dtypes for compare (tz-aware ts -> naive, decimals -> str)
        for df in (exp, got):
            for c in df.columns:
                if str(df[c].dtype).startswith("datetime64"):
                    try: df[c] = df[c].dt.tz_localize(None)
                    except Exception: pass
        exp = exp.sort_values(list(exp.columns), ignore_index=True)
        got = got.sort_values(list(got.columns), ignore_index=True)
        if len(exp) != len(got):
            bad.append((name, f"rows exp={len(exp)} got={len(got)}"))
            continue
        import pandas as pd
        mism = []
        for c in exp.columns:
            e, g = exp[c], got[c]
            try:
                same = (e.astype(str).fillna("NULL") == g.astype(str).fillna("NULL")).all()
            except Exception:
                same = False
            if not same:
                # float tolerance check for diagnosis
                try:
                    import numpy as np
                    diff = np.abs(e.astype(float) - g.astype(float)).max()
                    mism.append(f"{c} maxdiff={diff}")
                except Exception:
                    idx = (e.astype(str) != g.astype(str)).idxmax()
                    mism.append(f"{c} first: exp={e[idx]!r} got={g[idx]!r}")
        if mism:
            bad.append((name, "; ".join(mism)))
        else:
            ok.append(name)
    except Exception as ex:
        bad.append((name, f"ERROR {type(ex).__name__}: {ex}"))

rows_only = [os.path.basename(d) for d in glob.glob(f"{outdir}/*")
             if os.path.isdir(d) and os.path.basename(d) not in oracle]
print(f"PASS {len(ok)}/{len(oracle)}: {' '.join(ok)}")
print(f"ROWS-ONLY ({len(rows_only)}): {' '.join(sorted(rows_only))}")
for n, why in bad:
    print(f"FAIL {n}: {why}")
sys.exit(1 if bad else 0)
