"""Deterministic scale-up of the driver's sf0.1 fixtures for scale benching.

Replicates every table K times with consistent key offsets so all join
relationships survive (replica i's orders reference replica i's
customers, etc.). Dimension tables (region, nation) are copied as-is —
exactly the shape a real scale-factor increase has. Two modes:

* ``fair`` (default): replica payloads are deterministically perturbed —
  every token of a replica document gets a replica suffix (so its
  shingle/minhash profile is disjoint from the original) and replica
  embeddings get a replica-dependent sign-flip pattern (cosine vs the
  original ≈ 0). A small slice (doc_id % 500 == 0) is left verbatim so a
  realistic duplicate tail exists. Workload grows ~linearly with K: this
  measures how the engine scales with DATA.
* ``dense``: verbatim replication. Every document gains K exact copies,
  so pair-shaped dedup work grows ~K² per group: this is the adversarial
  stress test for the dedup chain (bucket caps, exact-collapse paths).

Output parquet is written PER_THREAD_OUTPUT (a directory of files per
table) so Spark gets real scan parallelism — a single parquet file under
maxPartitionBytes is ONE task no matter how many cores exist, which
silently serializes map-only benchmarks.

Usage: python tools/make_scale_data.py [K] [fair|dense] [src] [out]
Nothing outside /root/repo is touched; .benchdata/ is gitignored.
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


def _perturb(table: str, col: str, i: int, mode: str) -> str | None:
    """Replica-i payload expression, or None to keep the column."""
    if mode != "fair" or i == 0:
        return None
    if table == "documents" and col == "text":
        # suffix every token -> token/shingle sets disjoint from the
        # original; keep doc_id % 500 == 0 verbatim as the duplicate tail
        return (
            "CASE WHEN doc_id % 500 = 0 THEN text ELSE "
            "array_to_string(list_transform(string_split(text, ' '), "
            f"x -> x || 'r{i}'), ' ') END AS text"
        )
    if table == "embeddings" and col == "embedding":
        # deterministic sign-flip pattern per (replica, dim): cosine vs
        # the original (and between most replica pairs) ~ 0, far under
        # any near-dup threshold
        return (
            "list_transform(range(1, len(embedding) + 1), "
            f"j -> embedding[j] * (CASE WHEN (j * {i}) % 3 = 0 "
            "THEN 1 ELSE -1 END)::FLOAT)::FLOAT[] AS embedding"
        )
    return None


def make(k: int, mode: str, src: str, out: str) -> None:
    outp = pathlib.Path(out)
    outp.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.sql("SET threads TO 8")
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
            exprs = []
            for c in cols:
                if (off := offs.get(c)) is not None:
                    exprs.append(f"{c} + {i * off}::BIGINT AS {c}")
                elif (p := _perturb(table, c, i, mode)) is not None:
                    exprs.append(p)
                else:
                    exprs.append(c)
            arms.append(
                f"SELECT {', '.join(exprs)} FROM '{src}/{table}.parquet'"
            )
        # directory-of-files output => real Spark scan parallelism
        con.sql(
            f"COPY ({' UNION ALL '.join(arms)}) TO '{out}/{table}.parquet' "
            "(FORMAT parquet, PER_THREAD_OUTPUT, ROW_GROUP_SIZE 65536)"
        )
        n = con.sql(
            f"SELECT count(*) FROM '{out}/{table}.parquet/*.parquet'"
        ).fetchone()[0]
        print(f"{table}: x{k} {mode} -> {n} rows")


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    mode = sys.argv[2] if len(sys.argv) > 2 else "fair"
    assert mode in ("fair", "dense"), mode
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    default_out = f"/root/repo/.benchdata/sf{k / 10:g}" + (
        "-dense" if mode == "dense" else ""
    )
    out = sys.argv[4] if len(sys.argv) > 4 else default_out
    make(k, mode, src, out)
