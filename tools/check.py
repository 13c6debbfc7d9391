#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare graft.Verify
parquet dumps against DuckDB runs of SparkEntry.oracleSql.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Dev tooling only — not part of the library (uses driver-side duckdb).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    import math
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


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
            spark = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            sdf = spark.fetchall()
            scols = [d[0] for d in spark.description]
            stypes = {d[0]: str(d[1]) for d in spark.description}
            duck = con.sql(sql)
            ddf = duck.fetchall()
            dcols = [d[0] for d in duck.description]
            dtypes = {d[0]: str(d[1]) for d in duck.description}
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_bad += 1
            continue
        issues = []
        if sorted(scols) != sorted(dcols):
            issues.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(sdf) != len(ddf):
            issues.append(f"rows spark={len(sdf)} duck={len(ddf)}")
        if not issues:
            for c in scols:
                if stypes[c] != dtypes.get(c):
                    issues.append(
                        f"type {c}: spark={stypes[c]} duck={dtypes.get(c)}")
            sidx = [scols.index(c) for c in sorted(scols)]
            didx = [dcols.index(c) for c in sorted(dcols)]
            for i, (sr, dr) in enumerate(zip(sdf, ddf)):
                sv = [norm(sr[j]) for j in sidx]
                dv = [norm(dr[j]) for j in didx]
                if sv != dv:
                    issues.append(f"row {i}: spark={sv} duck={dv}")
                    if sum(1 for x in issues if x.startswith("row ")) > 3:
                        break
        if issues:
            n_bad += 1
            print(f"FAIL {name}:")
            for msg in issues[:6]:
                print(f"  {msg}")
        else:
            n_ok += 1
            print(f"ok   {name} ({len(sdf)} rows)")
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
