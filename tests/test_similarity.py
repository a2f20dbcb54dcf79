"""Similarity-search tests: brute force is the oracle; IVF must trade
recall for scan reduction sanely."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mknssh_11_bigdata_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
)
from mknssh_11_bigdata_spark.sources.readers import load_table

from conftest import SF_SMOKE

K = 5
N_QUERIES = 10


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings").cache()


def test_brute_force_contract(spark, emb):
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    out = brute_force_topk(emb, queries, "vec_id", "embedding", k=K)
    rows = out.collect()
    assert len(rows) == N_QUERIES * K
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, K + 1))
        # self excluded, cosine non-increasing
        assert all(r.neighbor_id != q for r in rs)
        sims = [r.cosine for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_ivf_recall_vs_brute_force(spark, emb):
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = brute_force_topk(emb, queries, "vec_id", "embedding", k=K)
    approx = ivf_topk(
        emb, queries, "vec_id", "embedding", k=K, n_centroids=16, n_probe=8
    )
    exact_set = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    # probing half the cells: decent-but-not-perfect recall expected
    assert recall >= 0.5, f"IVF recall {recall:.2f} too low"
    # every approx hit must be a real corpus row with rank sanity
    for r in approx.collect():
        assert r.rank <= K and r.neighbor_id != r.query_id
