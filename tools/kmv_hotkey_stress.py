"""bottom_k_stats phase-1 memory stress (VERDICT r6 defect #2).

Phase 1 of the two-phase KMV merge buffers the full per-(key,
partition) hash slice in a ``collect_list`` before sort+slice — the
docstring admits "transient state = the partition's rows". This bench
measures the WORST case the verdict names: ONE key x 20M rows, where
every partition's entire slice belongs to the hot key, so each of the
P phase-1 groups buffers n/P hashes (~20M/32 = 625k longs ~= 5 MB of
agg state per task — the number this bench exists to put on record).

Also times the ``row_number`` window form on the same frame for the
same-shape comparison BASELINE.md r6 made at 4M-distinct keys.

Usage: python tools/kmv_hotkey_stress.py  (prints one JSON line)
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from mknssh_11_bigdata_spark.operators.sketches import bottom_k_stats

ROWS = 20_000_000
K = 64


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("kmv-hotkey-stress")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # one hot key; hashes = xxhash64 of the row id (distinct-ish, the
    # adversarial shape: nothing collapses before the collect_list)
    df = (
        spark.range(ROWS, numPartitions=32)
        .select(
            F.lit("hot").alias("k"),
            F.xxhash64("id").alias("h"),
        )
        .localCheckpoint(eager=True)
    )
    out: dict[str, object] = {
        "metric": "kmv_hotkey_stress",
        "rows": ROWS,
        "k": K,
        "partitions": 32,
    }
    # merge form (shipped)
    reps = []
    for _ in range(3):
        t0 = time.monotonic()
        r = bottom_k_stats(df, "k", "h", K).collect()
        reps.append(time.monotonic() - t0)
    out["merge_form_s"] = round(sorted(reps)[1], 2)
    out["hk_merge"] = r[0]["hk"]
    # window form (reference arm)
    w = Window.partitionBy("k").orderBy("h")
    reps = []
    for _ in range(3):
        t0 = time.monotonic()
        r2 = (
            df.withColumn("rn", F.row_number().over(w))
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_exact"),
                F.max(F.when(F.col("rn") <= K, F.col("h"))).alias("hk"),
            )
            .collect()
        )
        reps.append(time.monotonic() - t0)
    out["window_form_s"] = round(sorted(reps)[1], 2)
    out["hk_window"] = r2[0]["hk"]
    out["hk_equal"] = bool(out["hk_merge"] == out["hk_window"])
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
