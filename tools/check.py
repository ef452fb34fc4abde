#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: runs each oracle SQL in
DuckDB over the sf parquet tables and compares (rows, schema-ish, values)
against the parquet Verify dumped. Dev-only tool — not part of the library."""
import json, sys, glob
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name in sorted(oracle):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"MISSING  {name}: no parquet output"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fail += 1; continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"SCHEMA   {name}: got {gc} want {ec}"); fail += 1; continue
    g = got[gc].sort_values(gc).reset_index(drop=True)
    e = exp[ec].sort_values(ec).reset_index(drop=True)
    if len(g) != len(e):
        print(f"ROWS     {name}: got {len(g)} want {len(e)}"); fail += 1; continue
    same = all(
        (str(g[c].values.tolist()) == str(e[c].values.tolist())) for c in gc)
    if same:
        print(f"OK       {name} ({len(g)} rows)"); ok += 1
    else:
        print(f"VALUES   {name}")
        for c in gc:
            if str(g[c].values.tolist()) != str(e[c].values.tolist()):
                print(f"  col {c}:\n   got {g[c].values.tolist()[:5]}\n   exp {e[c].values.tolist()[:5]}")
        fail += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
