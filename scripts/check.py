#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify at a
scale factor, execute each oracle SQL in DuckDB over the same parquet
tables, and compare rows / schema (sorted column names) / values.

Usage: python3 scripts/check.py [sfDir] [outDir]
"""
import json, subprocess, sys, os
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify" if os.access("/tmp", os.W_OK) else "/root/repo/target/verify"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    os.makedirs(OUT, exist_ok=True)
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:])
        # Verify exits nonzero when any query throws (round-12 regression:
        # crashed queries silently vanished from the report) — surface the
        # per-query errors it recorded before bailing
        errp = f"{OUT}/errors.json"
        if os.path.exists(errp):
            for k, v in json.load(open(errp)).items():
                print(f"ERROR {k}: {v[:300]}")
        sys.exit(1)
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)

    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            exp = con.execute(sql).df()
            got = con.execute(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
            exp = exp[sorted(exp.columns)]
            got = got[sorted(got.columns)]
            rows = len(exp) == len(got)
            schema = list(exp.columns) == list(got.columns)
            if rows and schema:
                e = exp.astype(str).values.tolist()
                g = got.astype(str).values.tolist()
                match = e == g
                if not match:
                    for i, (a, b) in enumerate(zip(e, g)):
                        if a != b:
                            print(f"  {name} first diff row {i}: oracle={a} spark={b}")
                            break
            else:
                match = False
            results[name] = {"rows": rows, "schema": schema, "values": match,
                             "spark_rows": len(got), "oracle_rows": len(exp)}
        except Exception as ex:
            results[name] = {"error": str(ex)[:300]}
    # queries with no oracle: rows-only
    import glob
    for d in sorted(glob.glob(f"{OUT}/q*")):
        name = os.path.basename(d)
        if name not in oracle and os.path.isdir(d):
            try:
                n = len(con.execute(f"SELECT * FROM '{d}/*.parquet'").df())
                results[name] = {"rows_only": n, "values": n > 0}
            except Exception as ex:
                results[name] = {"error": str(ex)[:300]}

    ok = all(v.get("values") for v in results.values())
    # README drift guard: the stated query counts must match the artifact
    # (the counts have drifted three rounds running when unchecked)
    n_queries = len([d for d in glob.glob(f"{OUT}/q*") if os.path.isdir(d)])
    # BENCH_FULL drift guard: the builder-written bench artifact must
    # cover the WHOLE query surface — a truncated BENCH_r*.json stdout
    # tail must never be the only record (round-10 verdict item 7)
    bench_full = "/root/repo/BENCH_FULL.json"
    if os.path.exists(bench_full):
        n_bench = len(json.load(open(bench_full)).get("queries", {}))
        if n_bench != n_queries:
            print(f"FAIL BENCH_FULL: {n_bench} bench timings vs {n_queries} queries "
                  f"in the artifact — regenerate with graft.Bench")
            ok = False
    readme = open("/root/repo/README.md").read()
    if (f"{n_queries} queries" not in readme
            or f"{len(oracle)} of {n_queries} hash-verified" not in readme):
        print(f"FAIL README: counts drifted — artifact has {n_queries} queries, "
              f"{len(oracle)} of {n_queries} hash-verified")
        ok = False
    for k, v in results.items():
        flag = "PASS" if v.get("values") else "FAIL"
        print(f"{flag} {k}: {v}")
    print("ALL PASS" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 2)

main()
