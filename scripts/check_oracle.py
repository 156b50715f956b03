#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle_sql.json
entry in DuckDB against the sf parquet tables, compare with the Spark parquet
dumps produced by graft.Verify (columns sorted by name, rows sorted, exact
value compare)."""
import json, sys, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"{name}: MISSING spark output"); fails += 1; continue
    spark_df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    d = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(d.columns):
        print(f"{name}: SCHEMA mismatch spark={list(s.columns)} duck={list(d.columns)}")
        fails += 1; continue
    if len(s) != len(d):
        print(f"{name}: ROWS mismatch spark={len(s)} duck={len(d)}"); fails += 1; continue
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    d = d.sort_values(by=list(d.columns)).reset_index(drop=True)
    eq = True
    for c in s.columns:
        sv, dv = s[c], d[c]
        try:
            if sv.dtype.kind == 'f' or dv.dtype.kind == 'f':
                match = (sv.isna() & dv.isna()) | (sv == dv)
            else:
                match = (sv.astype(str) == dv.astype(str))
            ok = match.all()
        except Exception as e:
            match = pd.Series(False, index=s.index)
            ok = False
        if not ok:
            mism = ~match
            idx = mism[mism].index[:3]
            print(f"{name}: VALUE mismatch col={c} e.g. spark={sv[idx].tolist()} duck={dv[idx].tolist()}")
            eq = False
    if eq:
        print(f"{name}: OK rows={len(s)}")
    else:
        fails += 1
sys.exit(1 if fails else 0)
