#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check_parity.py <verifyOutDir> <sfDir> [query,...]
Reads <verifyOutDir>/<q>/*.parquet (Spark result) and oracle_sql.json,
runs each oracle in DuckDB over the sf parquet tables, and compares
rows/schema/values after sorting columns by name and rows by all columns
(the driver's hash semantics).
"""
import glob, json, sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def main() -> int:
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else sorted(oracles)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    rc = 0
    for q in names:
        files = glob.glob(f"{out_dir}/{q}/*.parquet")
        if not files:
            print(f"{q}: NO SPARK OUTPUT"); rc = 1; continue
        spark_df = norm(pd.concat(pd.read_parquet(f) for f in files))
        if q not in oracles:
            print(f"{q}: rows={len(spark_df)} (no oracle)"); continue
        ora_df = norm(con.execute(oracles[q]).df())
        status = []
        if list(spark_df.columns) != list(ora_df.columns):
            status.append(f"SCHEMA spark={list(spark_df.columns)} oracle={list(ora_df.columns)}")
        if len(spark_df) != len(ora_df):
            status.append(f"ROWS spark={len(spark_df)} oracle={len(ora_df)}")
        if not status:
            s = spark_df.astype(str).reset_index(drop=True)
            o = ora_df.astype(str).reset_index(drop=True)
            if not s.equals(o):
                diff = (s != o).any(axis=1)
                status.append(f"VALUES {int(diff.sum())} differing rows; first:\n"
                              f"spark {s[diff].head(3).to_dict('records')}\n"
                              f"ora   {o[diff].head(3).to_dict('records')}")
        if status:
            print(f"{q}: FAIL " + " | ".join(status)); rc = 1
        else:
            print(f"{q}: OK rows={len(spark_df)}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
