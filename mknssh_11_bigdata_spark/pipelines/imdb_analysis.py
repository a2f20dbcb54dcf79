"""IMDb EDA & trends — the reference's ``data_analysis.py`` + notebook
cells 24-38, recomposed single-pass and window-capable.

Key divergences from the reference (SURVEY.md §2.4/§4.3):

* ``basic_stats`` is ONE aggregation (the reference ran ``df.count()``
  repeatedly uncached — M8 ⚠).
* The trends DataFrame is built once and can be cached by the caller for
  the three plots that consume it (the reference recomputed the full
  plan per plot — §3.3 ⚠).
* Cumulative/ranking variants use window functions (absent from the
  reference, which dropped to pandas for cumsum — §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.relational import cumulative_sum, histogram, null_profile
from .imdb_features import KEPT_TITLE_TYPES, YEAR_RANGE, clean_titles

__all__ = [
    "basic_stats",
    "trends_dataframe",
    "title_type_distribution",
    "genre_distribution",
    "yearly_production",
    "rating_histogram",
    "rating_histogram_cumulative",
]

#: Genres excluded from trend analysis (data_analysis.py:98,
#: analysis.ipynb#cell26).
EXCLUDED_GENRES = ("Adult", "Short")


def basic_stats(df: DataFrame) -> dict:
    """Row count, per-column nulls, numeric summary — ONE cached pass +
    one ``summary()`` job (replaces ``analysis_basic_stats``,
    ``data_analysis.py:8-41``, which ran 6 uncached counts)."""
    profile = null_profile(df).collect()[0].asDict()
    numeric = [
        name
        for name, dtype in df.dtypes
        if dtype in ("int", "bigint", "double", "float")
    ]
    summary = (
        df.select(*numeric).summary("min", "max", "mean", "stddev").collect()
        if numeric
        else []
    )
    return {
        "row_count": profile.pop("row_count"),
        "null_counts": {
            k.removesuffix("_nulls"): v for k, v in profile.items()
        },
        "numeric_summary": [r.asDict() for r in summary],
    }


def trends_dataframe(
    title_basics: DataFrame, title_ratings: DataFrame
) -> DataFrame:
    """Genre-year trends (``analysis_get_trends_dataframe``,
    ``data_analysis.py:44-116``): clean titles → inner join ratings →
    explode genres → drop excluded genres → group (genre, startYear) →
    mean rating / total votes.

    The reference's string-validity gymnastics (regex-validating numVotes
    digits, re-casting year/rating — ``data_analysis.py:78-105``) vanish
    here: the explicit read schema already typed those columns.
    """
    titles = clean_titles(title_basics).select(
        "tconst", "startYear", "genres"
    )
    joined = titles.join(title_ratings, "tconst", "inner")
    exploded = joined.select(
        "startYear",
        "averageRating",
        "numVotes",
        F.explode("genres").alias("genre"),
    ).filter(~F.col("genre").isin(*EXCLUDED_GENRES))
    return exploded.groupBy("genre", "startYear").agg(
        F.mean("averageRating").alias("mean_rating"),
        F.sum("numVotes").alias("total_votes"),
    )


def title_type_distribution(title_basics: DataFrame) -> DataFrame:
    """analysis.ipynb#cell24: titleType histogram, descending."""
    return (
        histogram(title_basics, "titleType", count_col="n_titles")
        .orderBy(F.desc("n_titles"), F.asc("titleType"))
    )


def genre_distribution(title_basics: DataFrame) -> DataFrame:
    """analysis.ipynb#cell26: exploded genre histogram (excl. Short)."""
    exploded = title_basics.select(
        F.explode("genres").alias("genre")
    ).filter(~F.col("genre").isin(*EXCLUDED_GENRES))
    return histogram(exploded, "genre", count_col="n_titles").orderBy(
        F.desc("n_titles"), F.asc("genre")
    )


def yearly_production(title_basics: DataFrame) -> DataFrame:
    """analysis.ipynb#cell28: titles per startYear in the window."""
    return (
        title_basics.filter(
            F.col("titleType").isin(*KEPT_TITLE_TYPES)
            & F.col("startYear").between(*YEAR_RANGE)
        )
        .groupBy("startYear")
        .agg(F.count(F.lit(1)).alias("n_titles"))
        .orderBy("startYear")
    )


def rating_histogram(
    title_basics: DataFrame, title_ratings: DataFrame
) -> DataFrame:
    """analysis.ipynb#cell30: rating histogram over cleaned+rated titles
    (group by the raw 0.1-step double, as the reference did)."""
    cleaned = clean_titles(title_basics).select("tconst")
    rated = cleaned.join(title_ratings, "tconst", "inner")
    return histogram(rated, "averageRating", count_col="n_titles").orderBy(
        "averageRating"
    )


def rating_histogram_cumulative(
    title_basics: DataFrame, title_ratings: DataFrame
) -> DataFrame:
    """The pandas ``cumsum`` the reference computed driver-side
    (analysis.ipynb#cell30), as a Spark window over the (tiny) histogram."""
    return cumulative_sum(
        rating_histogram(title_basics, title_ratings),
        order_by=["averageRating"],
        value_col="n_titles",
        out="cum_titles",
    )
