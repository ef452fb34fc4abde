#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir]

Expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have been run
(or runs it with --run). Compares each <outDir>/<name> parquet against the
DuckDB execution of oracle_sql.json, with columns sorted by name (the
driver hashes values after sorting columns by name).
"""
import json, sys, subprocess, os
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

if "--run" in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {sf} {out}'],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"})
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:]); sys.exit(1)

con = duckdb.connect()
tables = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
for t in tables:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out}/oracle_sql.json"))
fails = []
# a query that errored inside Verify never dumps a directory — that must
# fail the gate, not silently vanish from the comparison loop
dumped = {n for n in os.listdir(out) if os.path.isdir(os.path.join(out, n))}
for name in sorted(set(oracles) - dumped):
    print(f"{name:24s} MISSING (query failed during Verify)")
    fails.append(name + " [missing dump]")
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    spark_df = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    if name not in oracles:
        print(f"{name:24s} rows={len(spark_df):6d}  (rows-only, no oracle)")
        if len(spark_df) == 0:
            fails.append(name + " [EMPTY rows-only result]")
        continue
    try:
        odf = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"{name:24s} ORACLE SQL ERROR: {e}")
        fails.append(name)
        continue
    sdf = spark_df[sorted(spark_df.columns)]
    odf = odf[sorted(odf.columns)] if len(odf.columns) else odf
    ok_rows = len(sdf) == len(odf)
    ok_cols = list(sdf.columns) == list(odf.columns)
    ok_schema = ok_cols and all(
        str(a) == str(b) for a, b in zip(sdf.dtypes, odf.dtypes))
    ok_vals = False
    if ok_rows and ok_cols:
        try:
            pd.testing.assert_frame_equal(
                sdf.reset_index(drop=True), odf.reset_index(drop=True),
                check_dtype=False, check_exact=True)
            ok_vals = True
        except AssertionError as e:
            ok_vals = False
            err = str(e).split("\n")[0:4]
    status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
    print(f"{name:24s} rows={len(sdf):6d}/{len(odf):6d} cols_eq={ok_cols} "
          f"schema_eq={ok_schema} vals_eq={ok_vals} -> {status}")
    if status == "FAIL":
        fails.append(name)
        if ok_cols and not ok_schema:
            print("   spark:", dict(zip(sdf.columns, map(str, sdf.dtypes))))
            print("   duck :", dict(zip(odf.columns, map(str, odf.dtypes))))
        if not ok_cols:
            print("   spark cols:", list(sdf.columns))
            print("   duck  cols:", list(odf.columns))
        if ok_rows and ok_cols and not ok_vals:
            for line in err:
                print("   ", line)
            # show first mismatching rows
            for c in sdf.columns:
                neq = (sdf[c].astype(str) != odf[c].astype(str))
                if neq.any():
                    i = neq.idxmax()
                    print(f"    first diff col={c} row={i}: "
                          f"spark={sdf[c][i]!r} duck={odf[c][i]!r}")
                    break

print()
if fails:
    print("FAILED:", ", ".join(fails))
    sys.exit(1)
print("ALL GREEN")
