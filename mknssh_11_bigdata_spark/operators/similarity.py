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

__all__ = [
    "brute_force_topk",
    "ivf_topk",
    "kmeans_centroids",
    "quantized_topk",
    "ivf_int8_topk",
]


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


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
    iters: int = 2,
    sample_mod: int = 1,
    round_to: int = 9,
) -> DataFrame:
    """Deterministic Lloyd k-means fit over the embedding column →
    ``(centroid_id, __cent)`` DataFrame consumable by :func:`ivf_topk`.

    Determinism contract (what makes this oracle-reproducible, unlike
    MLlib's randomized KMeans): init = the ``n_centroids`` smallest-id
    vectors; a FIXED number of iterations (no convergence test);
    assignment by cosine rounded to 6 digits with smaller-centroid-id
    tie-break; new centroids = per-dimension means rounded to
    ``round_to`` digits (so Spark's partial-agg summation order and any
    other engine's agree); empty clusters keep their previous centroid.

    Scale: each iteration is one broadcast-literal assignment pass +
    one (cid, dim) partial-agg shuffle; only k×dim means cross the
    driver per iteration — model-sized, like any distributed ML fit.
    At 100 TB fit on a deterministic slice via ``sample_mod`` (keep row
    iff ``id % sample_mod == 0``); assignment quality needs a sample,
    not the corpus.
    """
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    spark = corpus.sparkSession
    fit = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    if sample_mod > 1:
        fit = fit.filter(F.col(id_col) % sample_mod == 0)
    # The fit frame is consumed once for init and once per Lloyd
    # iteration; checkpoint so the scan+cast runs once. At 100 TB the
    # fit input is the sample_mod slice — sized to be materializable.
    fit = fit.localCheckpoint(eager=True)
    schema = StructType(
        [
            StructField("centroid_id", IntegerType()),
            StructField("__cent", ArrayType(DoubleType())),
        ]
    )
    init = fit.orderBy(F.col(id_col).asc()).limit(n_centroids).collect()
    cents: list[list[float]] = [list(r["__v"]) for r in init]
    for _ in range(iters):
        cent_df = spark.createDataFrame(list(enumerate(cents)), schema)
        assigned = (
            fit.crossJoin(F.broadcast(cent_df))
            .withColumn(
                "__sim",
                F.round(
                    cosine_similarity(F.col("__v"), F.col("__cent")), 6
                ),
            )
            .groupBy(id_col)
            .agg(
                F.max_by(
                    F.col("centroid_id"),
                    F.struct(F.col("__sim"), -F.col("centroid_id")),
                ).alias("cid"),
                F.first("__v").alias("__v"),
            )
        )
        means = (
            assigned.select("cid", F.posexplode("__v").alias("dim", "x"))
            .groupBy("cid", "dim")
            .agg(F.round(F.avg("x"), round_to).alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in means:
            by_cid.setdefault(r["cid"], {})[r["dim"]] = r["m"]
        cents = [
            [by_cid[i][d] for d in sorted(by_cid[i])]
            if i in by_cid
            else cents[i]
            for i in range(n_centroids)
        ]
    return spark.createDataFrame(list(enumerate(cents)), schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    exclude_self: bool = True,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-bucketed approximate top-k.

    1. centroids := ``centroids`` if given (``(centroid_id, __cent)``,
       e.g. from :func:`kmeans_centroids`), else the ``n_centroids``
       corpus vectors with the smallest ids (deterministic stand-in —
       same plan either way).
    2. corpus rows → nearest centroid (broadcast centroids, row_number).
    3. queries → ``n_probe`` nearest centroids.
    4. score only corpus rows in probed cells; rank per query.

    Probing fraction n_probe/n_centroids bounds the scan. Recall is
    tested against ``brute_force_topk`` (tests/test_similarity.py).
    """
    if centroids is not None:
        cent = centroids
    else:
        # cent is broadcast from TWO consumers (corpus assignment +
        # query probing); left lazy each broadcast recomputes the
        # orderBy+limit over the corpus scan. n_centroids rows —
        # materialize once. (The kmeans path checkpoints its own fit.)
        cent = (
            corpus.select(F.col(id_col), F.col(vec_col))
            .orderBy(F.col(id_col).asc())
            .limit(n_centroids)
            .select(
                F.col(id_col).alias("centroid_id"),
                F.col(vec_col).alias("__cent"),
            )
            .localCheckpoint(eager=True)
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


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    exclude_self: bool = True,
) -> DataFrame:
    """Int8-quantized cosine top-k — the bandwidth/storage scale path.

    Symmetric per-vector max-abs quantization (``functions.vectors.
    quantize_int8``) shrinks a float32 embedding 4x; candidate scoring
    is then an EXACT int64 dot product, ranked by the quantized cosine
    ``qdot / (|q| · |n|)`` (norms also integer, so the only float ops
    are two sqrts and one divide — bit-reproducible cross-engine).

    Output: ``(query_id, rank, neighbor_id, qdot, qcos)``.

    Why it matters at 100 TB: a 1e9-vector corpus of 768-dim float32 is
    ~3 TB of embedding payload per scan; int8 cuts the scan (and every
    shuffle that carries vectors) to ~0.77 TB, and integer
    multiply-adds vectorize wider than float on every CPU. Plan shape
    is identical to ``brute_force_topk``: broadcast the (quantized)
    query set, scan-score the corpus, per-query ranking moves only
    scored rows. Zero vectors (amax == 0) are unquantizable and are
    dropped from both sides, mirrored by the oracle.
    """
    from ..functions.vectors import int_dot, max_abs, quantize_int8

    def q8(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        amax = max_abs(F.col(vec_col))
        return (
            df.withColumn("__amax", amax)
            .filter(F.col("__amax") > 0)
            .select(
                F.col(id_col).alias(out_id),
                quantize_int8(F.col(vec_col), F.col("__amax")).alias(
                    out_vec
                ),
            )
        )

    q = q8(queries, "query_id", "__qv")
    c = spread(q8(corpus, "neighbor_id", "__nv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .withColumn("qdot", int_dot(F.col("__qv"), F.col("__nv")))
        .withColumn(
            "qcos",
            F.round(
                F.col("qdot")
                / (
                    F.sqrt(int_dot(F.col("__qv"), F.col("__qv")))
                    * F.sqrt(int_dot(F.col("__nv"), F.col("__nv")))
                ),
                6,
            ),
        )
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "qdot", "qcos")
    )


def ivf_int8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    exclude_self: bool = True,
) -> DataFrame:
    """The production ANN composition: IVF cell pruning + int8 scoring.

    Cell assignment and probing use FLOAT cosine against the (min-id)
    centroids — centroid geometry should not inherit quantization
    error — while candidate scoring inside the probed cells is the
    exact-int64 quantized dot of :func:`quantized_topk`. Scan cost is
    bounded by n_probe/n_centroids AND every scanned vector is 4x
    smaller: the two levers compose. Unquantizable (zero) vectors are
    dropped from corpus, queries, and centroid election alike, so the
    deterministic contract (and the SQL oracle) is unchanged.

    Output: ``(query_id, rank, neighbor_id, qdot, qcos)``.
    """
    from ..functions.vectors import int_dot, max_abs, quantize_int8

    def q8(df: DataFrame, out_id: str) -> DataFrame:
        amax = max_abs(F.col(vec_col))
        return (
            df.withColumn("__amax", amax)
            .filter(F.col("__amax") > 0)
            .select(
                F.col(id_col).alias(out_id),
                F.col(vec_col).cast("array<double>").alias("__v"),
                quantize_int8(F.col(vec_col), F.col("__amax")).alias(
                    "__q"
                ),
            )
        )

    # Same double-broadcast consumer pattern as ivf_topk: materialize
    # the tiny centroid frame once instead of re-running the
    # quantize+limit scan per broadcast.
    cent = (
        q8(corpus, "centroid_id")
        .orderBy(F.col("centroid_id").asc())
        .limit(n_centroids)
        .select("centroid_id", F.col("__v").alias("__cent"))
        .localCheckpoint(eager=True)
    )
    c = spread(q8(corpus, "neighbor_id"))
    assigned = (
        c.crossJoin(F.broadcast(cent))
        .withColumn(
            "__csim",
            F.round(cosine_similarity(F.col("__v"), F.col("__cent")), 6),
        )
        .groupBy("neighbor_id")
        .agg(
            F.max_by(
                F.col("centroid_id"),
                F.struct(F.col("__csim"), -F.col("centroid_id")),
            ).alias("centroid_id"),
            F.first("__q").alias("__nq"),
        )
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("__qsim").desc(), F.col("centroid_id").asc()
    )
    probed = (
        q8(queries, "query_id")
        .crossJoin(F.broadcast(cent))
        .withColumn(
            "__qsim",
            F.round(cosine_similarity(F.col("__v"), F.col("__cent")), 6),
        )
        .withColumn("__rn", F.row_number().over(probe_w))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", F.col("__q").alias("__qq"), "centroid_id")
    )
    scored = (
        assigned.join(probed, "centroid_id")
        .withColumn("qdot", int_dot(F.col("__qq"), F.col("__nq")))
        .withColumn(
            "qcos",
            F.round(
                F.col("qdot")
                / (
                    F.sqrt(int_dot(F.col("__qq"), F.col("__qq")))
                    * F.sqrt(int_dot(F.col("__nq"), F.col("__nq")))
                ),
                6,
            ),
        )
    )
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "qdot", "qcos")
    )
