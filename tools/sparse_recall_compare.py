#!/usr/bin/env python
"""Measure the sparse-dedup composition tradeoff (wall clock + pair
recall vs the exact scorer) on a scale dataset: the exact inverted-index
tf-idf cosine arm vs the MinHash-LSH→re-score composition.

Counterpart of tools/ann_compare.py for the lexical path. The point
(BASELINE.md "tf-idf at scale"): the composed arm must buy its escape
from Σdf² candidate growth with bounded recall loss against the exact
arm's full pair set — measured, not asserted. "Invented" pairs must be
zero by construction (re-scoring is exact on proposed candidates); a
non-zero count means the two arms' tokenization drifted.

Usage: python tools/sparse_recall_compare.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.benchdata/sf1"

    from mknssh_11_bigdata_spark import get_spark
    from mknssh_11_bigdata_spark.queries import QUERIES

    spark = get_spark(
        app_name="sparse-recall",
        master="local[32]",
        shuffle_partitions=32,
    )

    def pairs(name: str) -> tuple[set, float]:
        t0 = time.time()
        rows = QUERIES[name].spark(spark, sf_dir).collect()
        wall = time.time() - t0
        return {(r["id_a"], r["id_b"]) for r in rows}, wall

    exact, exact_wall = pairs("dedup_tfidf_cosine")
    composed, composed_wall = pairs("dedup_tfidf_rescore_lsh")

    invented = composed - exact
    recall = len(composed & exact) / max(1, len(exact))
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "exact_pairs": len(exact),
                "composed_pairs": len(composed),
                "recall": round(recall, 6),
                "invented_pairs": len(invented),
                "exact_wall_sec": round(exact_wall, 2),
                "composed_wall_sec": round(composed_wall, 2),
            }
        )
    )
    return 0 if not invented else 1


if __name__ == "__main__":
    raise SystemExit(main())
