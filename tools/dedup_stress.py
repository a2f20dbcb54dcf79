#!/usr/bin/env python
"""Measure the dedup-chain scale claims on an adversarial dense corpus.

VERDICT r1 noted the LSH bucket-cap / exact-collapse benefits were
asserted, not measured. This tool measures them on a ``dense``-mode
scale dataset (``tools/make_scale_data.py K dense``), where every
document has K verbatim copies — the boilerplate-cluster worst case for
banded LSH (k-row buckets emit O(k^2) candidate pairs).

Three measured configurations over the same corpus:

* ``raw_lsh``        — MinHash→LSH candidate pairs straight over the raw
                       corpus, NO bucket cap: the naive baseline. Pair
                       count grows ~K^2 per duplicate group.
* ``raw_lsh_capped`` — same, with the production hot-bucket cap: bounds
                       the pair blowup without touching true near-dups
                       below the cap.
* ``collapsed``      — exact-collapse first (one fingerprint shuffle),
                       then LSH over UNIQUE texts only: the production
                       composition (queries_llm.dedup_collapsed_components).

Prints one JSON line: per-config wall seconds + emitted candidate-pair
counts. Expectation at K=10: raw pair count ~K^2/2 x collapsed's, and
collapsed wall-clock strictly under raw.

Usage: python tools/dedup_stress.py [data_dir] (default
.benchdata/dense10, built from sf0.01 to keep the stress CPU-bound on
pair emission, not scan).
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

DEFAULT_DIR = "/root/repo/.benchdata/dense10"


def main() -> int:
    data = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_DIR
    if not pathlib.Path(data).exists():
        subprocess.run(
            [
                sys.executable,
                "/root/repo/tools/make_scale_data.py",
                "10",
                "dense",
                "/root/testdata/sf0.01",
                data,
            ],
            check=True,
        )

    from pyspark.sql import functions as F

    from mknssh_11_bigdata_spark import get_spark
    from mknssh_11_bigdata_spark.operators.dedup import (
        exact_collapse,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from mknssh_11_bigdata_spark.queries_llm import (
        BANDS,
        LSH_MAX_BUCKET,
        NUM_HASHES,
    )
    from mknssh_11_bigdata_spark.sources.readers import load_table

    spark = get_spark(app_name="dedup-stress")
    docs = load_table(spark, data, "documents")
    results: dict[str, dict[str, float]] = {}

    def run(tag: str, pairs_df) -> None:
        t0 = time.perf_counter()
        n = pairs_df.count()
        results[tag] = {
            "sec": round(time.perf_counter() - t0, 2),
            "candidate_pairs": n,
        }

    sig = minhash_signatures(docs, "doc_id", "text", NUM_HASHES, 3)
    run(
        "raw_lsh",
        lsh_candidate_pairs(sig, "doc_id", bands=BANDS),
    )
    run(
        "raw_lsh_capped",
        lsh_candidate_pairs(
            sig, "doc_id", bands=BANDS, max_bucket_size=LSH_MAX_BUCKET
        ),
    )
    # A cap BELOW the dense-copy group size: shows the guard actually
    # binding — oversized (boilerplate) buckets dropped, pair count and
    # wall-clock bounded. This is the 100 TB posture; the production
    # default (LSH_MAX_BUCKET) is set high so small-SF oracle output
    # stays exact.
    run(
        "raw_lsh_cap64",
        lsh_candidate_pairs(
            sig, "doc_id", bands=BANDS, max_bucket_size=64
        ),
    )

    t0 = time.perf_counter()
    reps, mapping = exact_collapse(docs, "doc_id", "text")
    rep_sig = minhash_signatures(reps, "doc_id", "text", NUM_HASHES, 3)
    rep_pairs = lsh_candidate_pairs(
        rep_sig, "doc_id", bands=BANDS, max_bucket_size=LSH_MAX_BUCKET
    )
    n = rep_pairs.count()
    n_unique = mapping.filter(
        F.col("doc_id") == F.col("rep_id")
    ).count()
    results["collapsed"] = {
        "sec": round(time.perf_counter() - t0, 2),
        "candidate_pairs": n,
        "unique_texts": n_unique,
    }

    n_docs = docs.count()
    print(
        json.dumps(
            {"data_dir": data, "n_docs": n_docs, "configs": results}
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
