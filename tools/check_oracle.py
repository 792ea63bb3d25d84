#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query parquet in outDir, executes the matching oracle SQL in
DuckDB against the same testdata tables, then compares rows after
sorting columns by name and rows by all columns (the driver's compare).

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # normalize ints (duckdb hugeint -> object/float) and floats
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = pd.to_numeric(df[c])
            except (ValueError, TypeError):
                pass
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            spark_df = canon(pd.concat(
                [pd.read_parquet(f) for f in glob.glob(f"{qdir}/*.parquet")],
                ignore_index=True))
            duck_df = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} "
                  f"duck={list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        try:
            # compare as strings to approximate a value-hash compare
            sa = spark_df.astype(str)
            da = duck_df.astype(str)
            if sa.equals(da):
                print(f"PASS {name} ({len(spark_df)} rows)")
                n_pass += 1
            else:
                diff = (sa != da).any(axis=1)
                idx = diff[diff].index[:3]
                print(f"FAIL {name}: value mismatch at rows {list(idx)}")
                for i in idx:
                    print(f"  spark: {spark_df.loc[i].to_dict()}")
                    print(f"  duck : {duck_df.loc[i].to_dict()}")
                n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: compare error {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
