"""IMDb TSV sources: explicit schemas + single-pass loader.

Re-expresses ``load_tables``
(``/root/reference/scripts/data_processing.py:10-67``) Spark-first:

* Explicit ``StructType`` per table (SURVEY.md §1.3-1.4) — the reference
  used ``inferSchema=True`` (an extra full pass per file) then patched
  types with 11 casts (``data_processing.py:54-64``). One declared schema
  replaces both.
* ``nullValue='\\N'`` at the reader replaces six full-table
  ``when(col=='\\N', None)`` projections (``data_processing.py:45-51``).
* csv-list pseudo-arrays (genres, directors, writers, professions,
  knownForTitles) become real ``ArrayType`` columns once at ingest
  (``arrayify``), so downstream explodes don't re-split strings.
* ``isAdult`` is declared STRING deliberately: the dump contains junk
  values (``analysis.ipynb#cell12`` shows max="2024"); an int schema
  would silently null those rows at scan (SURVEY §4.4.4). The cleaning
  contract handles it explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .readers import arrayify, read_tsv

__all__ = ["IMDB_SCHEMAS", "IMDB_ARRAY_COLUMNS", "load_imdb_tables"]


def _schema(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType(
        [T.StructField(name, dtype, True) for name, dtype in fields]
    )


S = T.StringType()
I = T.IntegerType()
D = T.DoubleType()

IMDB_SCHEMAS: dict[str, T.StructType] = {
    "name_basics": _schema(
        ("nconst", S),
        ("primaryName", S),
        ("birthYear", I),
        ("deathYear", I),
        ("primaryProfession", S),
        ("knownForTitles", S),
    ),
    "title_akas": _schema(
        ("titleId", S),
        ("ordering", I),
        ("title", S),
        ("region", S),
        ("language", S),
        ("types", S),
        ("attributes", S),
        ("isOriginalTitle", I),
    ),
    "title_basics": _schema(
        ("tconst", S),
        ("titleType", S),
        ("primaryTitle", S),
        ("originalTitle", S),
        ("isAdult", S),  # deliberately string; see module docstring
        ("startYear", I),
        ("endYear", I),
        ("runtimeMinutes", I),
        ("genres", S),
    ),
    "title_crew": _schema(
        ("tconst", S), ("directors", S), ("writers", S)
    ),
    "title_principals": _schema(
        ("tconst", S),
        ("ordering", I),
        ("nconst", S),
        ("category", S),
        ("job", S),
        ("characters", S),
    ),
    "title_ratings": _schema(
        ("tconst", S), ("averageRating", D), ("numVotes", I)
    ),
}

#: csv-list pseudo-array columns → ArrayType at ingest.
IMDB_ARRAY_COLUMNS: dict[str, dict[str, str]] = {
    "name_basics": {"primaryProfession": ",", "knownForTitles": ","},
    "title_basics": {"genres": ","},
    "title_crew": {"directors": ",", "writers": ","},
}


def load_imdb_tables(
    spark: SparkSession, data_dir: str, tables: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    """Load IMDb TSV dumps as ``{table: DataFrame}``.

    Expects ``{data_dir}/{table}.tsv`` (the reference's layout used
    ``name.basics.tsv`` style names; pass a rename map upstream if
    needed). One pass per file, arrays materialized.
    """
    tables = tables or tuple(IMDB_SCHEMAS)
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = read_tsv(spark, f"{data_dir}/{name}.tsv", IMDB_SCHEMAS[name])
        arrays = IMDB_ARRAY_COLUMNS.get(name)
        if arrays:
            df = arrayify(df, arrays)
        out[name] = df
    return out
