import duckdb, json, sys
import pandas as pd
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
sql = json.load(open(f'{out}/oracle_sql.json'))
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
for name, q in sorted(sql.items()):
    try:
        spark_df = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        oracle_df = con.sql(q).df()
        # driver-style: sort columns by name, compare
        s = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
        o = oracle_df[sorted(oracle_df.columns)].reset_index(drop=True)
        if list(s.columns) != list(o.columns):
            print(f"{name}: COLS MISMATCH spark={list(s.columns)} oracle={list(o.columns)}"); continue
        if s.shape != o.shape:
            print(f"{name}: SHAPE {s.shape} vs {o.shape}"); continue
        s2 = s.sort_values(by=list(s.columns)).reset_index(drop=True)
        o2 = o.sort_values(by=list(o.columns)).reset_index(drop=True)
        eq = True
        for c in s.columns:
            a, b = s2[c], o2[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                import numpy as np
                if not np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True):
                    bad = (a.astype(float) != b.astype(float)) & ~(a.isna() & b.isna())
                    print(f"{name}: VALUE DIFF col={c} nbad={bad.sum()} e.g. {a[bad].head(3).tolist()} vs {b[bad].head(3).tolist()}")
                    eq = False
            else:
                if not (a.astype(str) == b.astype(str)).all():
                    bad = a.astype(str) != b.astype(str)
                    print(f"{name}: VALUE DIFF col={c} nbad={bad.sum()} e.g. {a[bad].head(3).tolist()} vs {b[bad].head(3).tolist()}")
                    eq = False
        if eq: print(f"{name}: OK rows={len(s)}")
    except Exception as e:
        print(f"{name}: ERROR {str(e)[:200]}")
for name in sql.keys() if False else []:
    pass
# rows-only entries (no oracle)
import glob, os
for d in sorted(os.listdir(out)):
    if d.startswith('q_') and d not in sql:
        n = con.sql(f"SELECT count(*) FROM '{out}/{d}/*.parquet'").fetchone()[0]
        print(f"{d}: rows-only, rows={n}")
