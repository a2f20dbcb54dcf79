"""Query registry primitives.

Every SURVEY.md §2 operator (and every north-star extension) registers a
named query here as a (Spark callable, oracle SQL) pair. The Spark side
composes the engine's operator library; the oracle side is ANSI SQL that
DuckDB runs on the same parquet files (driver t2 gate). ``oracle=None``
marks genuinely non-SQL-expressible ops — the driver then records a
weaker rows-only check.

Both sides must alias computed columns identically and round floating
aggregates to a fixed scale (doubles summed in different orders differ in
final ulps; rounding makes order-insensitive hash comparison
well-defined).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    spark: SparkQuery
    oracle: str | None  # None => non-SQL-expressible (rows-only check)


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None):
    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = QuerySpec(spark=fn, oracle=oracle)
        return fn

    return deco
