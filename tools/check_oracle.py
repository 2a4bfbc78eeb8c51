#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [jsonOut]

Reads each <outDir>/<query>/ parquet written by graft.Verify, runs the
corresponding oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, sorts columns by name and rows by all columns,
and reports exact-match status per query. With jsonOut, also writes a
driver-shaped per-query record ({rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err}) — used for the committed CORRECTNESS_sf01
artifact (correctness evidence at the scale the bench claims).
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


def main(sf_dir: str, out_dir: str, json_out: str = None) -> int:
    con = duckdb.connect()
    # cap spill: at sf0.1 one unbounded oracle can fill the disk with
    # duckdb_temp_storage before failing; bound it so a heavy oracle
    # FAILS VISIBLY (recorded per-query) instead of taking the host down
    try:
        con.execute("SET max_temp_directory_size='20GB'")
    except Exception:
        pass
    for t in TABLES:
        # driver testdata ships single-file tables; ScaleUp-derived
        # benchdata (sf1) ships Spark directory-style tables under the
        # same <name>.parquet path — glob the parts in that case
        path = f"{sf_dir}/{t}.parquet"
        import os
        if os.path.isdir(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * "
                        f"FROM read_parquet('{path}/*.parquet')")
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    records = {}

    def rec(name, rows_match=False, schema_match=False, hash_match=False,
            spark_rows=-1, oracle_rows=-1, err=None):
        records[name] = {"rows_match": rows_match, "schema_match": schema_match,
                         "hash_match": hash_match, "spark_rows": spark_rows,
                         "oracle_rows": oracle_rows, "err": err}

    import glob
    query_dirs = sorted(d.rstrip("/").split("/")[-1]
                        for d in glob.glob(f"{out_dir}/*/"))
    for name in query_dirs:
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark result: {e}")
            rec(name, err=f"cannot read spark result: {e}")
            n_bad += 1
            continue
        if name not in oracle:
            # NOTHING was compared: record match fields as None (not
            # True) so a reader scanning the artifact cannot mistake a
            # non-empty-result check for oracle-verified evidence
            # (ADVICE r12); the distinct status carries the real claim.
            print(f"skip  {name}: no oracle (rows={len(got)})")
            records[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(got),
                             "oracle_rows": -1,
                             "status": "unverified" if len(got) > 0
                                       else "unverified_empty",
                             "err": "no oracle (rows-only check: rows > 0 "
                                    f"{'passed' if len(got) else 'FAILED'})"}
            if len(got) == 0:
                n_bad += 1
            continue
        try:
            want = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            rec(name, spark_rows=len(got), err=f"oracle SQL error: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL  {name}: columns {list(got.columns)} != {list(want.columns)}")
            rec(name, rows_match=len(got) == len(want),
                spark_rows=len(got), oracle_rows=len(want))
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL  {name}: rows {len(got)} != {len(want)}")
            rec(name, schema_match=True, spark_rows=len(got),
                oracle_rows=len(want))
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
            rec(name, rows_match=True, schema_match=True,
                spark_rows=len(got), oracle_rows=len(want))
            n_bad += 1
        else:
            # also flag dtype mismatches (schema-strictness risk)
            dt = [f"{c}: {got[c].dtype} vs {want[c].dtype}"
                  for c in got.columns if got[c].dtype != want[c].dtype]
            note = f"  [dtype: {'; '.join(dt)}]" if dt else ""
            print(f"ok    {name} (rows={len(got)}){note}")
            rec(name, rows_match=True, schema_match=not dt, hash_match=True,
                spark_rows=len(got), oracle_rows=len(want),
                err=f"dtype: {'; '.join(dt)}" if dt else None)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=2)
        print(f"wrote {json_out} ({len(records)} queries)")
    return n_bad


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2],
                       sys.argv[3] if len(sys.argv) > 3 else None) else 0)
