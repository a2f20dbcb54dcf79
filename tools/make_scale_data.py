"""Deterministic scale-up of the driver's sf0.1 fixtures for scale benching.

Replicates every table K times with consistent key offsets so all join
relationships survive (replica i's orders reference replica i's customers,
etc.). Dimension tables (region, nation) are left as-is — exactly the shape
a real scale factor increase has. Text/embedding payloads are copied
verbatim, so the duplicate density of `documents` rises with K — that is
intentional: it stress-tests the dedup chain with K-sized duplicate groups.

Output goes to .benchdata/sf<K/10> inside the repo (gitignored); nothing
outside /root/repo is touched. Usage:

    python tools/make_scale_data.py [K] [src_dir] [out_dir]
"""

from __future__ import annotations

import pathlib
import sys

import duckdb

# key column -> per-replica offset (chosen far above any real key range)
OFFSETS = {
    "customer": {"c_custkey": 10_000_000},
    "supplier": {"s_suppkey": 10_000_000},
    "part": {"p_partkey": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {
        "l_orderkey": 100_000_000,
        "l_partkey": 10_000_000,
        "l_suppkey": 10_000_000,
    },
    "events": {"event_id": 100_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}
COPY_AS_IS = ["region", "nation"]


def make(k: int, src: str, out: str) -> None:
    outp = pathlib.Path(out)
    outp.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table in COPY_AS_IS:
        con.sql(
            f"COPY (SELECT * FROM '{src}/{table}.parquet') "
            f"TO '{out}/{table}.parquet' (FORMAT parquet)"
        )
        print(f"{table}: copied as-is")
    for table, offs in OFFSETS.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'"
            ).fetchall()
        ]
        arms = []
        for i in range(k):
            sel = ", ".join(
                f"{c} + {i * off}::BIGINT AS {c}"
                if (off := offs.get(c))
                else c
                for c in cols
            )
            arms.append(f"SELECT {sel} FROM '{src}/{table}.parquet'")
        con.sql(
            f"COPY ({' UNION ALL '.join(arms)}) "
            f"TO '{out}/{table}.parquet' (FORMAT parquet)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: x{k} -> {n} rows")


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else f"/root/repo/.benchdata/sf{k / 10:g}"
    )
    make(k, src, out)
