#!/usr/bin/env python3
"""Dev-only oracle checker simulating the driver's DuckDB compare:
runs Verify's dumped parquet against oracle_sql.json over the sfDir tables.
Not part of the library (driver-side python only)."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    # driver testdata tables are single files; Spark-written replicas
    # (e.g. the SoakGen sf1 dir) are directories of part files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = ok = 0
for name, sql in sorted(oracle.items()):
    res_path = f"{out_dir}/{name}"
    if not os.path.isdir(res_path):
        print(f"MISSING  {name}: no spark dump"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{res_path}/*.parquet'").df()
    except Exception as e:
        print(f"READERR  {name}: {e}"); fail += 1; continue
    try:
        want = con.sql(sql).df()
    except Exception as e:
        print(f"ORACLEERR {name}: {e}"); fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"SCHEMA   {name}: spark={list(got.columns)} oracle={list(want.columns)}"); fail += 1; continue
    if len(got) != len(want):
        print(f"ROWS     {name}: spark={len(got)} oracle={len(want)}"); fail += 1; continue
    try:
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True),
                                      check_dtype=False, check_exact=True)
        print(f"OK       {name} ({len(got)} rows)"); ok += 1
    except AssertionError as e:
        first = str(e).strip().splitlines()
        print(f"VALUES   {name}: {first[0] if first else e}")
        fail += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
