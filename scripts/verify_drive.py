import sys, math
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import duckdb, __spark_entry__ as E

spark = SparkSession.builder.master("local[8]").getOrCreate()  # vanilla
spark.sparkContext.setLogLevel("ERROR")
r = E.entry(spark).collect()
print(f"t1 smoke: {len(r)} rows", flush=True)

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"create view {t} as select * from '/root/testdata/sf0.01/{t}.parquet'")

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(row[i] for i in order))
    return sorted(out, key=lambda t: tuple((v is None, str(v)) for v in t))

qs, os_ = E.queries(), E.oracle_sql()
fail = []
for name in sorted(qs):
    try:
        df = qs[name](spark, "/root/testdata/sf0.01")
        srows = [tuple(r) for r in df.collect()]
        scols = df.columns
        if name not in os_:
            print(f"{name}: rows-only, {len(srows)} rows", flush=True)
            continue
        cur = con.execute(os_[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        if sorted(scols) != sorted(ocols):
            fail.append((name, f"schema {sorted(scols)} vs {sorted(ocols)}")); continue
        a, b = norm(srows, scols), norm(orows, ocols)
        if a != b:
            diff = next((i for i,(x,y) in enumerate(zip(a,b)) if x!=y), min(len(a),len(b)))
            fail.append((name, f"values differ: {len(a)} vs {len(b)} rows; first diff idx {diff}: "
                               f"{a[diff] if diff<len(a) else None} vs {b[diff] if diff<len(b) else None}"))
        else:
            print(f"{name}: OK {len(a)} rows", flush=True)
    except Exception as exc:
        fail.append((name, f"EXC {type(exc).__name__}: {str(exc)[:300]}"))
print("=" * 40)
if fail:
    for n, m in fail: print("FAIL", n, m)
    sys.exit(1)
print("ALL OK")
