"""IMDb feature-table pipeline — the reference's ``generate_dataset``
(``/root/reference/scripts/data_processing.py:70-374``) recomposed from
the operator library, Spark-first.

Every stage is a pure ``DataFrame -> DataFrame`` function so Catalyst
sees one fused plan (the reference had the same functional shape,
``data_processing.py:340-374``; we keep it and fix the §4.4 bugs):

* NO per-stage ``repartition("tconst")`` (reference J8 ⚠ — AQE plans the
  join exchanges; a manual pre-shuffle just doubles them).
* Membership flags are broadcast semi-joins, not 1000-term regexes
  (J7 ⚠, exact ids — no prefix matches).
* Top-N entity ranking is tie-broken (T1 ⚠, deterministic).
* One-hot genre vocabulary is sorted (deterministic schema).
* The final ``dropna`` (reference §4.4.6 — silently dropped every title
  without akas/crew/principals) is EXPLICIT and configurable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.relational import (
    bucketize,
    conditional_counts,
    membership_flag,
    one_hot,
    top_n,
)

__all__ = [
    "clean_titles",
    "initial_form",
    "people_columns",
    "popularity_columns",
    "cleanup_columns",
    "generate_dataset",
    "rank_entities_by_impact",
]

#: Title types retained by the reference filter (data_processing.py:95,104).
KEPT_TITLE_TYPES = ("movie", "tvMovie", "short", "tvShort")
YEAR_RANGE = (2000, 2024)
MIN_VOTES = 100
RUNTIME_EDGES = [30, 91, 151]  # buckets: <30, 30-90, 91-150, >150
PRINCIPAL_CATEGORIES = ("actor", "actress", "producer", "writer")


def clean_titles(title_basics: DataFrame) -> DataFrame:
    """The reference's title filter chain (``data_processing.py:99-106``):
    non-null year/runtime/genres ∧ non-adult ∧ kept types ∧ year window.

    ``isAdult`` is a dirty string column; the reference's implicit-cast
    ``== 0`` silently dropped junk rows (§4.4.4). We make the contract
    explicit: keep rows whose isAdult is exactly '0'.
    """
    return title_basics.filter(
        F.col("startYear").isNotNull()
        & F.col("runtimeMinutes").isNotNull()
        & F.col("genres").isNotNull()
        & (F.col("isAdult") == "0")
        & F.col("titleType").isin(*KEPT_TITLE_TYPES)
        & F.col("startYear").between(*YEAR_RANGE)
    )


def initial_form(
    title_basics: DataFrame,
    title_ratings: DataFrame,
    title_akas: DataFrame,
    title_principals: DataFrame,
    genre_vocabulary: list[str] | None = None,
) -> DataFrame:
    """Stage 1 (``dataset_generate_initial_form``,
    ``data_processing.py:70-189``): filters → inner join ratings →
    genre one-hots → akas count → principals profile → runtime bucket.

    Scale notes: the ratings join shuffles both sides on tconst once and
    every later per-title aggregate joins back on the same key (AQE
    reuses/plans exchanges — no manual repartition, unlike reference J8).
    The genre vocabulary is the one data-dependent step (two-phase
    dynamic schema, §4.3); pass ``genre_vocabulary`` to skip the extra
    job at scale.
    """
    titles = clean_titles(title_basics)
    rated = title_ratings.filter(
        F.col("averageRating").isNotNull() & (F.col("numVotes") >= MIN_VOTES)
    )
    df = titles.join(rated, "tconst", "inner")

    # one-hot genres (F3) — array column, sorted vocabulary
    df, genre_cols = one_hot(
        df, "genres", vocabulary=genre_vocabulary, prefix="genre_", is_array=True
    )
    # one-hot titleType (F5) — fixed vocabulary, no discovery job
    df, type_cols = one_hot(
        df, "titleType", vocabulary=list(KEPT_TITLE_TYPES), prefix="type_"
    )

    # A1: akas rows per title. The reference counted ALL akas rows but
    # named it countries_count (§4.4.7) — we keep count(*) semantics under
    # the honest name and add the distinct-region variant.
    akas_counts = title_akas.groupBy(
        F.col("titleId").alias("tconst")
    ).agg(
        F.count(F.lit(1)).alias("akas_count"),
        F.countDistinct("region").alias("countries_count"),
    )
    df = df.join(akas_counts, "tconst", "left")

    # A2: principals profile — one conditional aggregation
    principals_profile = conditional_counts(
        title_principals,
        ["tconst"],
        {
            f"num_{c}s": F.col("category") == c
            for c in PRINCIPAL_CATEGORIES
        },
        extra_aggs=[
            F.count(F.lit(1)).alias("num_principals"),
            F.countDistinct("category").alias("num_principal_categories"),
        ],
    )
    df = df.join(principals_profile, "tconst", "left")

    # F6: runtime bucket {0:<30, 1:30-90, 2:91-150, 3:>150}; NULLs were
    # filtered above so the reference's NULL→3 quirk (§4.4.3) is moot.
    df = bucketize(
        df, "runtimeMinutes", edges=RUNTIME_EDGES, out="runtimeMinutesBucket"
    )
    return df


def _people_stats(
    exploded: DataFrame, name_basics: DataFrame, role: str
) -> DataFrame:
    """A3: per-title mean/min/max of people features for one crew role.

    ``exploded`` is (tconst, person_id). Joins person features then
    aggregates back to title grain — one shuffle each.
    """
    # size(NULL array) is -1 in Spark (legacy); the reference inherited
    # that quirk via size(split(NULL)) — we keep NULL as NULL so the
    # aggregates below skip missing people instead of counting -1.
    def _safe_size(c: str) -> F.Column:
        return F.when(F.col(c).isNotNull(), F.size(c))

    people = name_basics.select(
        F.col("nconst"),
        _safe_size("knownForTitles").alias("numKnownForTitles"),
        _safe_size("primaryProfession").alias("numProfessions"),
    )
    joined = exploded.join(
        people, exploded[f"{role}_id"] == people.nconst, "left"
    ).drop("nconst")
    return joined.groupBy("tconst").agg(
        F.mean("numKnownForTitles").alias(f"{role}_mean_known"),
        F.min("numKnownForTitles").alias(f"{role}_min_known"),
        F.max("numKnownForTitles").alias(f"{role}_max_known"),
        F.mean("numProfessions").alias(f"{role}_mean_prof"),
        F.min("numProfessions").alias(f"{role}_min_prof"),
        F.max("numProfessions").alias(f"{role}_max_prof"),
    )


def people_columns(
    df: DataFrame, title_crew: DataFrame, name_basics: DataFrame
) -> DataFrame:
    """Stage 2 (``dataset_add_people_columns``,
    ``data_processing.py:192-250``): explode crew lists → join person
    features (J5) → per-title stats (A3) → join back (J6)."""
    for role, col in (("writer", "writers"), ("director", "directors")):
        exploded = title_crew.select(
            "tconst", F.explode_outer(F.col(col)).alias(f"{role}_id")
        )
        stats = _people_stats(exploded, name_basics, role)
        df = df.join(stats, "tconst", "left")
    return df


def rank_entities_by_impact(
    df: DataFrame, entity_col: str, n: int = 1000
) -> DataFrame:
    """A4+T1 (``rank_entities_by_impact``, ``data_processing.py:273-288``):
    rank entities (directors/writers/…) by (avg rating, avg votes) with a
    DETERMINISTIC tie-break on the entity id (reference §4.4.5 had none).
    ``df`` must have columns (entity_col, averageRating, numVotes).
    TakeOrderedAndProject: no global sort, N rows per partition merged.
    """
    agg = df.groupBy(entity_col).agg(
        F.avg("averageRating").alias("avg_rating"),
        F.avg("numVotes").alias("avg_votes"),
    )
    return top_n(
        agg,
        order_by=[F.col("avg_rating").desc(), F.col("avg_votes").desc()],
        n=n,
        tie_breakers=[F.col(entity_col).asc()],
    )


def popularity_columns(
    df: DataFrame,
    title_crew: DataFrame,
    title_ratings: DataFrame,
    top_n_entities: int = 1000,
) -> DataFrame:
    """Stage 3 (``dataset_add_popularity_columns``,
    ``data_processing.py:253-315``): flag titles whose directors/writers
    are in the top-N by impact.

    Reference J7 ⚠ compiled the top-N ids into an unanchored 1000-term
    regex (O(rows×N) and prefix-buggy). Here: the ranked ids stay a
    DataFrame, and the flag is an exact broadcast semi-join on the
    exploded crew array (``membership_flag(is_array=True)``) — one hash
    probe per crew id, no driver roundtrip for the ids at all.
    """
    rated_crew = title_crew.join(title_ratings, "tconst", "inner")
    for role, col in (("director", "directors"), ("writer", "writers")):
        exploded = rated_crew.select(
            F.explode(F.col(col)).alias("entity"),
            "averageRating",
            "numVotes",
        )
        top_ids = rank_entities_by_impact(
            exploded, "entity", n=top_n_entities
        ).select("entity")
        crew_flags = membership_flag(
            title_crew.select("tconst", col),
            col,
            top_ids,
            out=f"has_top_{role}",
            is_array=True,
        ).select("tconst", f"has_top_{role}")
        df = df.join(crew_flags, "tconst", "left").na.fill(
            {f"has_top_{role}": 0}
        )
    return df


#: Columns the reference drops before ML (ids, leaky target cousins;
#: ``data_processing.py:318-337`` + ``model_train_explain.py:56,74``).
DROP_COLUMNS = (
    "primaryTitle",
    "originalTitle",
    "titleType",
    "genres",
    "isAdult",
    "endYear",
    "numVotes",  # label-leaky (votes correlate with rating availability)
)


def cleanup_columns(
    df: DataFrame,
    drop: tuple[str, ...] = DROP_COLUMNS,
    dropna_required: tuple[str, ...] = (),
) -> DataFrame:
    """Stage 4 (``dataset_cleanup_columns``,
    ``data_processing.py:318-337``). The reference followed with a bare
    ``dropna()`` that silently inner-joined away every title missing any
    left-joined feature (§4.4.6). Here missing-feature rows are KEPT with
    imputed zeros by default; pass ``dropna_required`` to drop on
    specific columns explicitly.
    """
    out = df.drop(*[c for c in drop if c in df.columns])
    if dropna_required:
        out = out.na.drop(subset=list(dropna_required))
    numeric = [
        name
        for name, dtype in out.dtypes
        if dtype in ("int", "bigint", "double", "float")
        and name not in ("averageRating",)
    ]
    return out.na.fill(0, subset=numeric)


def generate_dataset(
    tables: dict[str, DataFrame],
    genre_vocabulary: list[str] | None = None,
    top_n_entities: int = 1000,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """The full feature pipeline (``generate_dataset``,
    ``data_processing.py:340-374``): one fused lazy plan from six input
    tables to the ML feature table. The only mid-pipeline action is the
    genre-vocabulary discovery (skipped when a vocabulary is passed)."""
    df = initial_form(
        tables["title_basics"],
        tables["title_ratings"],
        tables["title_akas"],
        tables["title_principals"],
        genre_vocabulary=genre_vocabulary,
    )
    df = people_columns(df, tables["title_crew"], tables["name_basics"])
    df = popularity_columns(
        df,
        tables["title_crew"],
        tables["title_ratings"],
        top_n_entities=top_n_entities,
    )
    drop = tuple(c for c in DROP_COLUMNS if c not in keep)
    return cleanup_columns(df, drop=drop)
