#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare graft.Verify
parquet dumps against DuckDB runs of SparkEntry.oracleSql.

Faithful to the driver's comparison path (per round-2 ADVICE.md): the
Spark dump is loaded with pandas/pyarrow, the oracle runs via duckdb
.df(), both frames get columns sorted by name, rows sorted by all
columns, and the *stringified* cell values are compared. This is what
makes Decimal('43683.0600') != float('43683.06') and BIGINT 8 !=
HUGEINT-as-float 8.0 — differences the old fetchall() replica masked.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Dev tooling only — not part of the library (uses driver-side duckdb).
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    if len(df.columns) and len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    df = df.reset_index(drop=True)
    return df.astype(str)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            sdf = pd.concat([pd.read_parquet(f) for f in files],
                            ignore_index=True)
            ddf = con.sql(sql).df()
            schema_match = sorted(sdf.columns) == sorted(ddf.columns)
            rows_match = len(sdf) == len(ddf)
            hash_match = False
            detail = []
            if schema_match and rows_match:
                cs, cd = canon(sdf), canon(ddf)
                neq = (cs != cd).any(axis=1)
                hash_match = not bool(neq.any())
                if not hash_match:
                    for i in cs.index[neq][:3]:
                        for c in cs.columns:
                            if cs.at[i, c] != cd.at[i, c]:
                                detail.append(
                                    f"row {i} col {c}: "
                                    f"spark={cs.at[i, c]!r} "
                                    f"duck={cd.at[i, c]!r}")
            else:
                if not schema_match:
                    detail.append(f"cols spark={sorted(sdf.columns)} "
                                  f"duck={sorted(ddf.columns)}")
                if not rows_match:
                    detail.append(f"rows spark={len(sdf)} duck={len(ddf)}")
        except Exception as e:
            print(f"FAIL {name}: error {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if schema_match and rows_match and hash_match:
            n_ok += 1
            print(f"ok   {name} ({len(sdf)} rows)")
        else:
            n_bad += 1
            print(f"FAIL {name}: rows={rows_match} schema={schema_match} "
                  f"hash={hash_match}")
            for msg in detail[:6]:
                print(f"  {msg}")
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
