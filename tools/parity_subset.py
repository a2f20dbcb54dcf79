"""Oracle-parity check for a SUBSET of registered queries.

Usage: python tools/parity_subset.py name1 name2 ...  [--sf /root/testdata/sf0.01]

Same canonicalization as tools/drive_entry.py (the driver-sim), but
imports the registry directly so iterating on one new query doesn't pay
the full 123-query drive.
"""
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb

from mknssh_11_bigdata_spark import get_spark
from mknssh_11_bigdata_spark.queries import QUERIES

args = []
sf_dir = "/root/testdata/sf0.01"
argv = sys.argv[1:]
i = 0
while i < len(argv):
    a = argv[i]
    if a.startswith("--sf="):
        sf_dir = a.split("=", 1)[1]
    elif a == "--sf":  # the space form from the usage line
        i += 1
        if i >= len(argv):
            sys.exit("--sf requires a path argument")
        sf_dir = argv[i]
    elif a.startswith("--"):
        sys.exit(f"unknown flag {a!r} (usage: name1 name2 ... [--sf DIR])")
    else:
        args.append(a)
    i += 1
unknown = [n for n in args if n not in QUERIES]
if unknown:
    sys.exit(f"unknown queries: {unknown}")

spark = get_spark(app_name="parity-subset", master="local[8]", shuffle_partitions=8)
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
    )


def canon(v):
    if isinstance(v, float):
        # sign-sensitive on purpose: `+ 0.0` here would erase -0.0 and
        # hide driver-visible signed-zero divergence (VERDICT r4 #1)
        return "NaN" if math.isnan(v) else round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


fails = []
for name in args:
    spec = QUERIES[name]
    sdf = spec.spark(spark, sf_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        print(f"{name}: rows-only, {len(srows)} rows")
        continue
    rel = con.execute(spec.oracle)
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
        if sorted(scols) != sorted(dcols):
            print("  cols spark:", sorted(scols), "\n  cols duck :", sorted(dcols))
        shown = 0
        for a, b in zip(sc, dc):
            if a != b and shown < 3:
                print("  spark:", a, "\n  duck :", b)
                shown += 1

print("FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
