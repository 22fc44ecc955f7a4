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
import pyarrow as pa
import pyarrow.parquet as pq


def type_sig(t: pa.DataType):
    """Normalize an arrow type to a (family, width...) signature.

    Strict on the families the driver's hash is sensitive to (integer
    width/signedness, float width, decimal vs integer — DuckDB's windowed
    sum(BIGINT) yields HUGEINT/DECIMAL128 which must NOT equal int64),
    lenient on representation details the driver's value hash ignores
    (string vs large_string, timestamp tz/unit).
    """
    if pa.types.is_integer(t):
        return ("int", t.bit_width, pa.types.is_signed_integer(t))
    if pa.types.is_floating(t):
        return ("float", t.bit_width)
    if pa.types.is_decimal(t):
        return ("decimal", t.precision, t.scale)
    if pa.types.is_boolean(t):
        return ("bool",)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ("string",)
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return ("binary",)
    if pa.types.is_date(t):
        return ("date",)
    if pa.types.is_timestamp(t):
        return ("timestamp",)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", type_sig(t.value_type))
    if pa.types.is_struct(t):
        return ("struct", tuple((t.field(i).name, type_sig(t.field(i).type))
                                for i in range(t.num_fields)))
    if pa.types.is_map(t):
        return ("map", type_sig(t.key_type), type_sig(t.item_type))
    return ("other", str(t))


out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        spark_path = (glob.glob(f"{out_dir}/{name}/*.parquet")[0]
                      if glob.glob(f"{out_dir}/{name}/*.parquet")
                      else f"{out_dir}/{name}")
        spark_tbl = pq.read_table(spark_path)
        spark_df = spark_tbl.to_pandas()
    except Exception as e:
        fails.append((name, f"spark result unreadable: {e}")); continue
    try:
        duck_tbl = con.sql(sql).arrow()
        duck_df = duck_tbl.to_pandas()
    except Exception as e:
        fails.append((name, f"oracle SQL failed: {e}")); continue
    a = spark_df[sorted(spark_df.columns)]
    b = duck_df[sorted(duck_df.columns)]
    if list(a.columns) != list(b.columns):
        fails.append((name, f"columns differ: {list(a.columns)} vs {list(b.columns)}")); continue
    # driver hash-compares value ENCODINGS: an int64 Spark column vs a
    # DuckDB HUGEINT/DECIMAL result differs even when values agree.
    # Compare arrow-level type signatures before comparing values.
    sig_bad = []
    for c in a.columns:
        sa = type_sig(spark_tbl.schema.field(c).type)
        sb = type_sig(duck_tbl.schema.field(c).type)
        if sa != sb:
            sig_bad.append(f"col {c}: spark {sa} vs oracle {sb}")
    if sig_bad:
        fails.append((name, "dtype mismatch (driver hash would fail): "
                      + "; ".join(sig_bad))); continue
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
