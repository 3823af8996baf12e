#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify.scala's
parquet dumps against DuckDB running SparkEntry.oracleSql on the same
tables. Usage: python3 scripts/selfcheck.py [sfDir] [outDir]
(Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.)
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok, fail = [], []
for name, sql in sorted(oracle.items()):
    res_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        fail.append((name, "no spark output"))
        continue
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        fail.append((name, f"exec error: {e}"))
        continue
    # driver semantics: sort columns by name, then compare values
    spark_df = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
    duck_df = duck_df[sorted(duck_df.columns)].reset_index(drop=True)
    if list(spark_df.columns) != list(duck_df.columns):
        fail.append((name, f"columns differ: {list(spark_df.columns)} vs {list(duck_df.columns)}"))
        continue
    if len(spark_df) != len(duck_df):
        fail.append((name, f"rowcount differ: {len(spark_df)} vs {len(duck_df)}"))
        continue
    diffs = []
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        try:
            if not a.equals(b.astype(a.dtype)):
                neq = (a.astype(str) != b.astype(str))
                if neq.any():
                    i = neq.idxmax()
                    diffs.append(f"{c}[{i}]: {a[i]!r} vs {b[i]!r} ({neq.sum()} rows)")
        except Exception as e:
            diffs.append(f"{c}: compare error {e}")
    if diffs:
        fail.append((name, "; ".join(diffs[:3])))
    else:
        ok.append(name)

print(f"PASS {len(ok)}: {' '.join(ok)}")
for name, why in fail:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fail else 0)
