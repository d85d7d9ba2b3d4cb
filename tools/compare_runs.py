#!/usr/bin/env python3
"""Compare two Verify output dirs bit-exactly (atol=0) to detect
run-to-run nondeterminism. Usage: compare_runs.py outA outB"""
import duckdb, os, sys

a, b = sys.argv[1], sys.argv[2]
con = duckdb.connect()
names = sorted(d for d in os.listdir(a) if d.startswith('q_'))
bad = 0
for name in names:
    try:
        da = con.sql(f"SELECT * FROM '{a}/{name}/*.parquet'").df()
        db = con.sql(f"SELECT * FROM '{b}/{name}/*.parquet'").df()
        cols = sorted(da.columns)
        da = da[cols].sort_values(by=cols).reset_index(drop=True)
        db = db[cols].sort_values(by=cols).reset_index(drop=True)
        if da.shape != db.shape:
            print(f"{name}: SHAPE {da.shape} vs {db.shape}"); bad += 1; continue
        diffs = []
        for c in cols:
            x, y = da[c], db[c]
            if x.dtype.kind == 'f':
                import numpy as np
                neq = ~((x == y) | (x.isna() & y.isna()))
                if neq.any():
                    mx = float(abs(x[neq] - y[neq]).max())
                    diffs.append(f"{c}(n={int(neq.sum())},maxabs={mx:.3e})")
            else:
                neq = x.astype(str) != y.astype(str)
                if neq.any():
                    diffs.append(f"{c}(n={int(neq.sum())})")
        if diffs:
            print(f"{name}: DIFF {', '.join(diffs)}"); bad += 1
        else:
            print(f"{name}: identical rows={len(da)}")
    except Exception as e:
        print(f"{name}: ERROR {str(e)[:150]}"); bad += 1
sys.exit(1 if bad else 0)
