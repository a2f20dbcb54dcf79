"""Bloom probe representation micro-bench (VERDICT r6 defect #1).

Measures per-row probe cost of the two one-row bitmap encodings as the
bitmap GROWS, holding the probe corpus fixed:

* **dense** — ``array<long>``, probe = ``element_at(arr, word+1)``:
  O(1) ordinal access on ArrayType, so cost per row must stay FLAT as
  m_bits grows (this is the shipped representation).
* **map** — ``map<long,long>``, probe = ``element_at(map, word)``:
  Spark's ``GetMapValue`` on a literal/row map is a LINEAR scan of the
  key array, so cost per row grows with the number of non-zero words —
  the r6 representation this bench exists to retire.

Items are n-scaled with m (16 bits/item — the production geometry), so
the map's key array grows proportionally with m. The map arm stops at
a smaller m than the dense arm because its runtime becomes the product
of corpus rows x non-zero words; extrapolation from its measured slope
is the design-point argument (at m = 10^10 / 10^8 non-zero words the
scan is ~10^5x the dense probe).

Usage: python tools/bloom_probe_bench.py  (prints one JSON line)
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mknssh_11_bigdata_spark.operators.sketches import (
    _WORD_BITS,
    bloom_bit_positions,
    bloom_build,
    bloom_probe,
    bloom_word_frame,
)

PROBE_ROWS = 200_000
K = 2
#: m_bits ladders; the map arm is capped where the linear scan is
#: already >100x the dense probe (larger sizes would take minutes for
#: a number whose growth rate is established by the first three points)
DENSE_MS = [1 << 14, 1 << 18, 1 << 22, 1 << 25]
MAP_MS = [1 << 16, 1 << 20, 1 << 22, 1 << 24]


def _map_build(df: DataFrame, item_col: str, m_bits: int, k: int):
    """The retired r6 map representation, reconstructed for comparison."""
    return bloom_word_frame(df, item_col, m_bits, k).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__word"), F.col("__bits")))
        ).alias("bloom_map")
    )


def _map_probe(df, item_col, bloom, m_bits, k, flag_col="bloom_hit"):
    staged = df.crossJoin(F.broadcast(bloom))
    for j, pos in enumerate(bloom_bit_positions(F.col(item_col), m_bits, k)):
        staged = staged.withColumn(f"__pos{j}", pos)
    hit = F.expr(
        " AND ".join(
            "(coalesce(element_at(bloom_map, "
            f"CAST(__pos{j} DIV {_WORD_BITS} AS BIGINT)), "
            "CAST(0 AS BIGINT)) & shiftleft(CAST(1 AS BIGINT), "
            f"CAST(__pos{j} % {_WORD_BITS} AS INT))) != 0"
            for j in range(k)
        )
    )
    return staged.withColumn(flag_col, hit).drop(
        "bloom_map", *[f"__pos{j}" for j in range(k)]
    )


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("bloom-probe-bench")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    probes = (
        spark.range(PROBE_ROWS)
        .select(F.concat(F.lit("p"), F.col("id")).alias("item"))
        .localCheckpoint(eager=True)
    )
    out: dict[str, dict[str, float]] = {"dense": {}, "map": {}}
    for form, sizes in (("dense", DENSE_MS), ("map", MAP_MS)):
        for m in sizes:
            items = spark.range(max(m // 16, 1)).select(
                F.concat(F.lit("k"), F.col("id")).alias("item")
            )
            if form == "dense":
                bloom = bloom_build(items, "item", m, K)
            else:
                bloom = _map_build(items, "item", m, K)
            bloom = bloom.localCheckpoint(eager=True)
            # warm once (broadcast build), then time 3 reps, keep median
            reps = []
            probe_fn = bloom_probe if form == "dense" else _map_probe
            probe_fn(probes, "item", bloom, m, K).agg(
                F.sum(F.col("bloom_hit").cast("long"))
            ).collect()
            for _ in range(3):
                t0 = time.monotonic()
                probe_fn(probes, "item", bloom, m, K).agg(
                    F.sum(F.col("bloom_hit").cast("long"))
                ).collect()
                reps.append(time.monotonic() - t0)
            out[form][str(m)] = round(sorted(reps)[1], 3)
            print(f"# {form} m={m}: {out[form][str(m)]} s", flush=True)
    print(
        json.dumps(
            {
                "metric": "bloom_probe_seconds_by_m_bits",
                "probe_rows": PROBE_ROWS,
                "k": K,
                **out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
