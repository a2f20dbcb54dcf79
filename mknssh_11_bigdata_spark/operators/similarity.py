"""Similarity search over embedding columns (``array<float>``).

North-star extension (BASELINE.json): approximate-nearest-neighbor over
an embedding column. Two strategies behind one output contract
``(query_id, rank, neighbor_id, cosine)``:

* ``brute_force_topk`` — exact: broadcast the query set, score every
  corpus row, rank per query. Linear in corpus size; the right baseline
  and the correctness oracle for recall tests.
* ``ivf_topk`` — IVF-style: deterministically pick centroids, assign
  corpus rows to their nearest centroid (one broadcast pass), probe only
  the ``n_probe`` nearest cells per query. Scan cost drops to
  ~n_probe/n_centroids of the corpus — the 100 TB path (a real system
  would k-means the centroids; deterministic pick keeps tests stable and
  the plumbing identical).

All math is JVM-side (``zip_with``/``aggregate`` fold in doubles,
left-to-right — deterministic and oracle-reproducible). No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine_similarity
from ..plans.layout import spread

__all__ = ["brute_force_topk", "ivf_topk"]


def _ranked(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: score = cosine(query, corpus) for every pair.

    ``queries`` is broadcast (query sets are small by construction); the
    corpus is scanned once with no shuffle until the per-query ranking,
    which moves only scored rows. Cosine is rounded to 6 digits BEFORE
    ranking so rank order is reproducible across engines.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = spread(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        )
    )
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine",
        F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6),
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    return _ranked(scored, k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-bucketed approximate top-k.

    1. centroids := the ``n_centroids`` corpus vectors with the smallest
       ids (deterministic stand-in for k-means; swap in real centroids
       without touching the plan).
    2. corpus rows → nearest centroid (broadcast centroids, row_number).
    3. queries → ``n_probe`` nearest centroids.
    4. score only corpus rows in probed cells; rank per query.

    Probing fraction n_probe/n_centroids bounds the scan. Recall is
    tested against ``brute_force_topk`` (tests/test_similarity.py).
    """
    cent = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("__cent"),
        )
    )
    c = spread(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        )
    )
    # argmax via max_by on (sim, -centroid_id): one partial-aggregating
    # groupBy instead of a sort window — no per-row rank shuffle. Ties
    # break toward the smaller centroid id (matching the probe order).
    assigned = (
        c.crossJoin(F.broadcast(cent))
        .withColumn(
            "__csim",
            F.round(cosine_similarity(F.col("__cv"), F.col("__cent")), 6),
        )
        .groupBy("neighbor_id")
        .agg(
            F.max_by(
                F.col("centroid_id"),
                F.struct(F.col("__csim"), -F.col("centroid_id")),
            ).alias("centroid_id"),
            F.first("__cv").alias("__cv"),
        )
        .select("neighbor_id", "__cv", "centroid_id")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("__qsim").desc(), F.col("centroid_id").asc()
    )
    probed = (
        q.crossJoin(F.broadcast(cent))
        .withColumn(
            "__qsim",
            F.round(cosine_similarity(F.col("__qv"), F.col("__cent")), 6),
        )
        .withColumn("__rn", F.row_number().over(probe_w))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "__qv", "centroid_id")
    )
    scored = assigned.join(probed, "centroid_id").withColumn(
        "cosine",
        F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6),
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    return _ranked(scored, k)
