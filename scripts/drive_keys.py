"""Targeted oracle drive: python scripts/drive_keys.py key1,key2 [sf_dir].

Runs the named registry entries on a vanilla SparkSession and compares
each against its DuckDB oracle (sorted columns, sorted rows — the
driver's compare shape). Exit 1 on any mismatch.
"""
import sys

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

import duckdb
import __spark_entry__ as E

keys = sys.argv[1].split(",")
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(row[i] for i in order) for row in rows]
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))


qs, os_ = E.queries(), E.oracle_sql()
fail = []
for name in keys:
    try:
        df = qs[name](spark, sf_dir)
        srows = [tuple(r) for r in df.collect()]
        scols = df.columns
        if name not in os_:
            print(f"{name}: rows-only, {len(srows)} rows", flush=True)
            continue
        cur = con.execute(os_[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        if sorted(scols) != sorted(ocols):
            fail.append((name, f"schema {sorted(scols)} vs {sorted(ocols)}"))
            continue
        a, b = norm(srows, scols), norm(orows, ocols)
        if a != b:
            diff = next(
                (i for i, (x, y) in enumerate(zip(a, b)) if x != y),
                min(len(a), len(b)),
            )
            fail.append(
                (name,
                 f"values differ: {len(a)} vs {len(b)} rows; idx {diff}: "
                 f"{a[diff] if diff < len(a) else None} vs "
                 f"{b[diff] if diff < len(b) else None}")
            )
        else:
            print(f"{name}: OK {len(a)} rows", flush=True)
    except Exception as exc:
        fail.append((name, f"EXC {type(exc).__name__}: {str(exc)[:400]}"))
if fail:
    for n, m in fail:
        print("FAIL", n, m)
    sys.exit(1)
print("ALL OK")
