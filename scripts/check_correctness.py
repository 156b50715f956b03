#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against DuckDB on the same parquet tables and compare per-query.

Usage: python3 scripts/check_correctness.py <sfDir> <verifyOutDir>
(Local dev tooling only — the shipped library is pure Scala/Spark.)
"""
import json
import sys
import glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything (approximates driver hashing); round floats first
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        try:
            expected = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        actual = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        e, a = normalize(expected), normalize(actual)
        if list(e.columns) != list(a.columns):
            print(f"FAIL {name}: columns {list(a.columns)} != oracle {list(e.columns)}")
            failures += 1
        elif len(e) != len(a):
            print(f"FAIL {name}: rows {len(a)} != oracle {len(e)}")
            failures += 1
        elif not e.equals(a):
            diff = (e != a).any(axis=1)
            print(f"FAIL {name}: {diff.sum()} mismatched rows; first:")
            print("  oracle:", e[diff].head(2).to_dict("records"))
            print("  spark :", a[diff].head(2).to_dict("records"))
            failures += 1
        else:
            print(f"OK   {name} ({len(a)} rows)")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
