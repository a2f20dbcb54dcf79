"""Vector math over ``array<float>``/``array<double>`` columns.

Built entirely from higher-order functions (``zip_with``/``aggregate``)
so the arithmetic runs JVM-side inside whole-stage codegen — no Python in
the hot path. ``aggregate`` folds left-to-right, which keeps double
summation order deterministic (important for oracle comparison and
reproducible ranking).

Used by the similarity-search and embedding-dedup extensions
(BASELINE.json north star; the reference's own embedding stage was
driver-side pandas, ``/root/reference/scripts/embeddings_generation.py``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot", "l2_norm", "cosine_similarity", "normalize"]


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length numeric arrays (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe on zero vectors (returns NULL)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def normalize(a: Column) -> Column:
    """L2-normalize an array column (pre-normalizing the corpus turns
    cosine top-k into dot-product top-k — half the flops per candidate)."""
    norm = l2_norm(a)
    return F.when(
        norm > 0, F.transform(a, lambda x: x.cast("double") / norm)
    )
