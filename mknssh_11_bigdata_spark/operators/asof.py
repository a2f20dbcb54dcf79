"""As-of (time-travel) join — an operator Spark lacks natively.

``asof_join(left, right, on, by)`` attaches, to every left row, the
most recent right row with ``right.on <= left.on`` within the same
``by`` key group — the standard operator for point-in-time feature
lookup (quotes→trades, last-click attribution, slowly-changing
dimensions).

Implementation is a composition of existing DataFrame ops, not a UDF
(SURVEY.md §2.7 — the reference has no as-of; this is north-star
surface): union-tag both sides, sort within ``by`` by event time, and
propagate the last right-side value forward with a running
``max_by``-over-window. Cost = ONE shuffle on the ``by`` key + a
per-key sort — the same price as the groupBy both inputs already pay,
vs. the naive range-join which explodes to |left|×|right| per key.
Skewed ``by`` keys are AQE's problem (skew-join splitting does not
apply to windows, so extremely hot keys should be pre-salted by time
bucket — see plans/layout.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    right_cols: Sequence[str],
    suffix: str = "_asof",
    tolerance: str | None = None,
) -> DataFrame:
    """Point-in-time join: latest right row with ``on`` ≤ left's ``on``
    per ``by`` group.

    Parameters
    ----------
    on: ordering column name (identical on both sides; any orderable
        type — timestamp, long, date).
    by: equi-key columns (identical names both sides).
    right_cols: right columns to attach; each arrives as
        ``<col><suffix>``, NULL when no right row precedes the left row.
    tolerance: optional max lookback as an INTERVAL string (e.g.
        ``'30 minutes'``) — matches older than this are nulled out.

    Ties (right.on == left.on): the right row AT the same instant wins
    (inclusive ≤, matching pandas ``merge_asof`` default).
    """
    by = list(by)
    # Tag and union: right rows sort BEFORE left rows at the same
    # instant (is_left=1 > 0) so the inclusive-≤ tie rule holds.
    rtagged = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.struct(F.col(on).alias("__rt"), *right_cols).alias("__rv"),
    )
    lcols = [c for c in left.columns]
    ltagged = left.select(
        *lcols,
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(rtagged.schema["__rv"].dataType).alias("__rv"),
    )
    unioned = ltagged.unionByName(rtagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__last_rv", F.last("__rv", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        out = out.withColumn(
            "__last_rv",
            F.when(
                F.col("__last_rv.__rt")
                >= F.col("__t") - F.expr(f"INTERVAL {tolerance}"),
                F.col("__last_rv"),
            ),
        )
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col(f"__last_rv.{c}"))
    return out.select(
        *lcols, *[f"{c}{suffix}" for c in right_cols]
    )
