#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB oracle compare:
reads /tmp/verify_out/<q> parquet + oracle_sql.json, runs each SQL in
DuckDB against the sf tables, sorts columns by name + rows, compares."""
import sys, json, glob
import duckdb, pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        want = con.sql(sql).df()
        got = pd.read_parquet(f"{out}/{name}")
        want = want.reindex(sorted(want.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if sorted(want.columns) != sorted(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            fails += 1; continue
        ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        if len(ws) != len(gs):
            print(f"FAIL {name}: rows {len(gs)} vs {len(ws)}")
            fails += 1; continue
        ok = True
        for c in ws.columns:
            a, b = gs[c], ws[c]
            # the driver hash-compares exactly — a dtype mismatch (e.g.
            # DuckDB HUGEINT → float64 vs Spark int64) fails there even
            # when values are close, so flag it here too
            if a.dtype != b.dtype:
                print(f"WARN {name}: dtype col={c} got={a.dtype} want={b.dtype}")
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                import numpy as np
                if not np.allclose(a.astype(float), b.astype(float),
                                   rtol=1e-9, atol=1e-9, equal_nan=True):
                    ok = False; break
            else:
                if not (a.astype(str).values == b.astype(str).values).all():
                    ok = False; break
        if ok: print(f"PASS {name} ({len(gs)} rows)")
        else:
            print(f"FAIL {name}: value mismatch col={c}")
            print("  got:", gs.head(3).to_dict('records'))
            print("  want:", ws.head(3).to_dict('records'))
            fails += 1
    except Exception as e:
        print(f"ERROR {name}: {type(e).__name__} {str(e)[:200]}")
        fails += 1
for d in sorted(glob.glob(f"{out}/*/")):
    name = d.rstrip('/').split('/')[-1]
    if name in oracle: continue
    try:
        n = len(pd.read_parquet(d))
        print(f"ROWS {name}: {n}" + (" (EMPTY!)" if n == 0 else ""))
    except Exception as e:
        print(f"ERROR {name}: {e}")
print("FAILURES:", fails)
