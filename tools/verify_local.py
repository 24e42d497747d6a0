#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/verify_local.py [sfDir] [outDir]

Assumes graft.Verify has already written outDir/<name>/ parquet dirs and
outDir/oracle_sql.json (run via: sbt "runMain graft.Verify <sfDir> <outDir>").
Registers each fixture table as a DuckDB view, runs each oracle SQL, and
compares against the Spark result: column set (sorted by name), row count,
and values (rows sorted, exact for non-floats, tiny-tolerance report for
floats so drift is visible before it breaks a hash compare).

Driver-side tooling only — the shipped library has no Python dependency.
"""
import glob
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rows, cols):
    out = []
    for r in rows:
        row = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                row.append(("f", round(v, 9)))
            elif v is None:
                row.append(("n", ""))
            else:
                row.append(("s", str(v)))
        out.append(tuple(row))
    out.sort()
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracle):
        sql = oracle[name]
        spark_files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark result written")
            failures += 1
            continue
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        sdf = con.sql(
            f"SELECT * FROM read_parquet({spark_files!r})").df()
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            failures += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            failures += 1
            continue
        srows = norm(sdf.to_dict("records"), scols)
        orows = norm(odf.to_dict("records"), scols)
        if srows == orows:
            print(f"PASS {name} ({len(sdf)} rows)")
        else:
            bad = [(a, b) for a, b in zip(srows, orows) if a != b]
            print(f"FAIL {name}: {len(bad)} differing rows; first: "
                  f"spark={bad[0][0]} oracle={bad[0][1]}")
            failures += 1
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
