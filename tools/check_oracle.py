#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <outDir>/<query>/ parquet written by graft.Verify, runs the
corresponding oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, sorts columns by name and rows by all columns,
and reports exact-match status per query.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    import glob
    query_dirs = sorted(d.rstrip("/").split("/")[-1]
                        for d in glob.glob(f"{out_dir}/*/"))
    for name in query_dirs:
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark result: {e}")
            n_bad += 1
            continue
        if name not in oracle:
            print(f"skip  {name}: no oracle (rows={len(got)})")
            continue
        try:
            want = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} != {len(want)}")
            n_bad += 1
            continue
        # value compare, NaN/None-tolerant, dtype-lenient
        diffs = []
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                eq = (a.isna() & b.isna()) | (a == b)
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                idx = eq[~eq].index[0]
                diffs.append(f"{c}[{idx}]: {a[idx]!r} != {b[idx]!r}")
        if diffs:
            print(f"FAIL  {name}: {'; '.join(diffs[:3])}")
            n_bad += 1
        else:
            # also flag dtype mismatches (schema-strictness risk)
            dt = [f"{c}: {got[c].dtype} vs {want[c].dtype}"
                  for c in got.columns if got[c].dtype != want[c].dtype]
            note = f"  [dtype: {'; '.join(dt)}]" if dt else ""
            print(f"ok    {name} (rows={len(got)}){note}")
    return n_bad


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
