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

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "l2_norm",
    "cosine_similarity",
    "normalize",
    "max_abs",
    "quantize_int8",
    "int_dot",
    "lit_double_array",
    "lit_double_matrix",
    "lit_int_array",
]


def _sql_double(x: float) -> str:
    # repr() round-trips binary64 exactly (shortest-repr guarantee) and
    # Spark's D-suffixed literal parses via Double.parseDouble — the
    # same bits come out (verified incl. -0.0, subnormals, exponents).
    return repr(float(x)) + "D"


def lit_double_array(xs: list[float]) -> Column:
    """``array<double>`` literal in ONE driver call.

    ``F.lit(list)`` builds one Py4J column object per ELEMENT (~400 ms
    for a 8x64 model on this driver — measured, r8 optimization
    round); a single parsed SQL string is ~2 ms with bit-identical
    values. Non-finite values fall back to the slow exact path.

    Empty input raises (ADVICE r8): ``F.lit([])`` would produce an
    ``array<void>`` literal that silently fails type unification in any
    ``zip_with``/``aggregate`` against ``array<double>`` — callers
    always have dim > 0, so fail loudly instead."""
    if not xs:
        raise ValueError("lit_double_array: empty input")
    if not all(math.isfinite(float(x)) for x in xs):
        return F.lit([float(x) for x in xs])
    return F.expr("array(" + ",".join(_sql_double(x) for x in xs) + ")")


def lit_double_matrix(mat: list[list[float]]) -> Column:
    """``array<array<double>>`` literal in ONE driver call (see
    :func:`lit_double_array` for why not ``F.lit``; empty input/rows
    raise for the same ``array<void>`` reason — ADVICE r8)."""
    if not mat or not all(mat):
        raise ValueError("lit_double_matrix: empty matrix or empty row")
    if not all(
        all(math.isfinite(float(x)) for x in row) for row in mat
    ):
        return F.lit([[float(x) for x in row] for row in mat])
    body = ",".join(
        "array(" + ",".join(_sql_double(x) for x in row) + ")"
        for row in mat
    )
    return F.expr(f"array({body})")


def lit_int_array(xs: list[int]) -> Column:
    """``array<bigint>`` literal in ONE driver call — LongType to match
    what ``F.lit`` infers for a list of Python ints."""
    return F.expr("array(" + ",".join(f"{int(x)}L" for x in xs) + ")")


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


def max_abs(a: Column) -> Column:
    """Per-vector max-abs (the symmetric-quantization scale base)."""
    return F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))


def quantize_int8(a: Column, amax: Column) -> Column:
    """Symmetric int8 quantization: ``q_i = floor(x_i/amax*127 + 0.5)``.

    ``floor(x + 0.5)`` is half-up for BOTH signs and both engines (the
    SQL oracle uses the textually identical expression), unlike
    ``round`` whose half-way rule differs between Java (HALF_UP),
    numpy (half-even) and DuckDB. NULL on zero vectors (amax == 0).
    Values land in [-127, 127]; the int dot product of two 64-dim
    vectors is < 2²⁰ — exact in int64 and in the oracle's doubles.
    """
    return F.when(
        amax > 0,
        F.transform(
            a,
            lambda x: F.floor(
                x.cast("double") / amax * 127.0 + 0.5
            ).cast("long"),
        ),
    )


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product (int64 fold — no float error at all)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )

