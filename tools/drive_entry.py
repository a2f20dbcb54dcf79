"""Simulate the driver: consume __spark_entry__ exactly per its contract."""
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import __spark_entry__ as e
from mknssh_11_bigdata_spark import get_spark

spark = get_spark(app_name="driver-sim", master="local[8]", shuffle_partitions=8)

# 1. smoke: entry() at sf0.001
df = e.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.schema.simpleString()}")
assert len(rows) > 0

# determinism probe: run flagship twice, same sorted output
rows2 = e.entry(spark).collect()
assert sorted(map(repr, rows)) == sorted(map(repr, rows2)), "nondeterministic entry"
print("entry() deterministic across two runs")

# 2. t2: every queries() entry vs oracle_sql() at sf0.01
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.01/{t}.parquet')")

def canon(v):
    if isinstance(v, float):
        # sign-sensitive on purpose: `+ 0.0` here would erase -0.0 and
        # hide driver-visible signed-zero divergence (VERDICT r4 #1)
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v

from mknssh_11_bigdata_spark.session import release_checkpoints

qs, oracles = e.queries(), e.oracle_sql()
fails = []
for name, fn in sorted(qs.items()):
    release_checkpoints(spark)  # free the previous query's blocks
    sdf = fn(spark, "/root/testdata/sf0.01")
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    if name not in oracles:
        print(f"{name}: rows-only check, {len(srows)} rows")
        continue
    rel = con.execute(oracles[name])
    dcols = [c[0].lower() for c in rel.description]
    drows = rel.fetchall()
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    do = sorted(range(len(dcols)), key=lambda i: dcols[i])
    sc = sorted([tuple(canon(r[i]) for i in so) for r in srows], key=repr)
    dc = sorted([tuple(canon(r[i]) for i in do) for r in drows], key=repr)
    ok = sorted(scols) == sorted(dcols) and sc == dc
    print(f"{name}: spark={len(srows)} duck={len(drows)} match={ok}")
    if not ok:
        fails.append(name)
        for a, b in list(zip(sc, dc))[:3]:
            if a != b:
                print("  spark:", a, "\n  duck :", b)

print("FAILURES:", fails if fails else "none")
spark.stop()
sys.exit(1 if fails else 0)
