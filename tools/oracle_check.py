#!/usr/bin/env python3
"""Local oracle parity checker — replicates the driver's DuckDB compare.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Registers each parquet table under its bare name in DuckDB, runs every
query in oracle_sql.json, and compares against the Spark parquet dump:
columns sorted by name, rows sorted, exact value compare (floats via
repr equality after float64 cast).
"""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np
from canon_util import canon

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(f)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for q, sql in sorted(oracle.items()):
        spark_df = pd.read_parquet(f"{out_dir}/{q}")
        duck_df = con.execute(sql).df()
        a, b = canon(spark_df), canon(duck_df)
        ok_schema = list(a.columns) == list(b.columns)
        ok_rows = len(a) == len(b)
        ok_vals = False
        if ok_schema and ok_rows:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=True)
                ok_vals = True
            except AssertionError as e:
                print(f"[{q}] VALUE MISMATCH: {str(e)[:300]}")
        if ok_schema and ok_rows and ok_vals:
            n_ok += 1
            print(f"[{q}] OK rows={len(a)}")
        else:
            n_bad += 1
            print(f"[{q}] FAIL schema={ok_schema} ({list(a.columns)} vs "
                  f"{list(b.columns)}) rows={len(a)}/{len(b)}")
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
