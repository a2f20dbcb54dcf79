"""Semantic tests for the dedup family: planted exact/near duplicates
must be found; unrelated documents must not pair."""

from __future__ import annotations

import pytest

from mknssh_11_bigdata_spark.operators.dedup import (
    exact_duplicate_groups,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    simhash,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "on the warm windowsill in the afternoon sun near the garden"
)
NEAR = BASE + " today"  # one appended word => very high 3-gram jaccard
OTHER = (
    "completely different content about spark query engines and "
    "distributed columnar storage with adaptive execution plans"
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, BASE),
            (2, "  THE  quick brown fox jumps over the lazy dog while the cat sleeps on the warm windowsill in the afternoon sun near the garden "),
            (3, NEAR),
            (4, OTHER),
        ],
        ["doc_id", "text"],
    )


def test_exact_duplicate_groups_normalizes_case_and_whitespace(spark, docs):
    groups = {
        r.fp: (r.n_docs, r.keeper)
        for r in exact_duplicate_groups(docs, "text", "doc_id").collect()
    }
    # doc 1 and doc 2 differ only in case/extra whitespace => same group
    assert (2, 1) in groups.values()
    sizes = sorted(n for n, _ in groups.values())
    assert sizes == [1, 1, 2]


def test_jaccard_pairs_finds_near_dup_only(spark, docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(
            docs, "doc_id", "text", shingle_n=3, threshold=0.5
        ).collect()
    }
    assert (1, 3) in pairs
    assert pairs[(1, 3)] > 0.9
    assert not any(4 in p for p in pairs)


def test_minhash_lsh_pipeline_finds_planted_pair(spark, docs):
    out = {
        (r.id_a, r.id_b)
        for r in minhash_dedup_pairs(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    # exact dup pair (1,2) differs in normalization => tokens differ;
    # near-dup (1,3) and (2-vs-3 via shared shingles) must be caught.
    assert (1, 3) in out
    assert not any(a == 4 or b == 4 for a, b in out)


def test_lsh_candidates_superset_of_verified_pairs(spark, docs):
    sigs = minhash_signatures(docs, "doc_id", "text")
    cands = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, "doc_id").collect()
    }
    verified = {
        (r.id_a, r.id_b)
        for r in minhash_dedup_pairs(
            docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert verified <= cands


def test_simhash_identical_docs_equal_near_dups_close(spark, docs):
    fps = {r.doc_id: r.simhash for r in simhash(docs, "doc_id", "text").collect()}

    def hamming(a, b):
        return sum(x != y for x, y in zip(a, b))

    assert len(fps[1]) == 32
    # near-dup: small hamming distance; unrelated: larger
    assert hamming(fps[1], fps[3]) <= 6
    assert hamming(fps[1], fps[4]) > hamming(fps[1], fps[3])
