"""Driver simulation: hash-compare queries() vs oracle_sql() like the driver.

Usage: python /tmp/drive_sim.py name1 name2 ...   (or --all)
Env: SIM_SF_DIR (default /root/testdata/sf0.01)
"""
import importlib.util
import os
import sys

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SIM_SF_DIR", "/root/testdata/sf0.01")

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)

q, o = mod.queries(), mod.oracle_sql()
assert not set(o) - set(q), set(o) - set(q)

names = sys.argv[1:]
if names == ["--all"]:
    names = list(q)

con = duckdb.connect()
for t in [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
    )

fails = []
for name in names:
    try:
        sdf = q[name](spark, SF_DIR).toPandas()
        if name not in o:
            print(f"{name}: rows-only, {len(sdf)} rows")
            continue
        ddf = con.execute(o[name]).fetchdf()
        sdf = sdf[sorted(sdf.columns)].sort_values(sorted(sdf.columns)).reset_index(drop=True)
        ddf = ddf[sorted(ddf.columns)].sort_values(sorted(ddf.columns)).reset_index(drop=True)
        if list(sdf.columns) != list(ddf.columns):
            fails.append((name, f"columns {list(sdf.columns)} vs {list(ddf.columns)}"))
            continue
        if len(sdf) != len(ddf):
            fails.append((name, f"rowcount {len(sdf)} vs {len(ddf)}"))
            continue
        dt_s = [str(t) for t in sdf.dtypes]
        dt_d = [str(t) for t in ddf.dtypes]
        if dt_s != dt_d:
            fails.append((name, f"dtypes {dt_s} vs {dt_d}"))
            continue
        try:
            pd.testing.assert_frame_equal(sdf, ddf, check_exact=True)
        except AssertionError as e:
            fails.append((name, str(e).split("\n")[0:3]))
            continue
        print(f"{name}: OK ({len(sdf)} rows)")
    except Exception as e:  # noqa: BLE001
        fails.append((name, f"{type(e).__name__}: {e}"))

if fails:
    print("\nFAILURES:")
    for n, msg in fails:
        print(f"  {n}: {msg}")
    sys.exit(1)
print("all green")
