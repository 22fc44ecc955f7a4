#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB oracle gate.

Usage: python3 tools/check_oracle.py /tmp/vout /root/testdata/sf0.01

Loads each <out>/<name> parquet (Spark result), runs <out>/oracle_sql.json's
SQL in DuckDB against the sf tables, sorts columns by name, compares shapes,
dtypes (loosely) and values row-by-row.
"""
import json, sys, glob
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        spark_df = pd.read_parquet(glob.glob(f"{out_dir}/{name}/*.parquet")[0]
                                   if glob.glob(f"{out_dir}/{name}/*.parquet")
                                   else f"{out_dir}/{name}")
    except Exception as e:
        fails.append((name, f"spark result unreadable: {e}")); continue
    try:
        duck_df = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"oracle SQL failed: {e}")); continue
    a = spark_df[sorted(spark_df.columns)]
    b = duck_df[sorted(duck_df.columns)]
    if list(a.columns) != list(b.columns):
        fails.append((name, f"columns differ: {list(a.columns)} vs {list(b.columns)}")); continue
    if len(a) != len(b):
        fails.append((name, f"row count differs: {len(a)} vs {len(b)}")); continue
    # driver hashes values; compare exactly, column by column
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(av, bv))
               if x != y and not (pd.isna(x) and pd.isna(y))]
        if bad:
            i, x, y = bad[0]
            fails.append((name, f"col {c}: {len(bad)} mismatches; first at row {i}: {x!r} vs {y!r}"))
            break
    else:
        print(f"  OK   {name}  ({len(a)} rows)")
for name, msg in fails:
    print(f"  FAIL {name}: {msg}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
