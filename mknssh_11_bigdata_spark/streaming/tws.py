"""Custom stateful streaming via ``transformWithStateInPandas`` (Spark 4).

The second-generation arbitrary-state API (SPARK-42952): named state
variables on a ``StatefulProcessorHandle`` instead of one opaque tuple,
RocksDB-backed state store, timers decoupled from state. This module
implements a **spend-tier alerting** operator on it:

    per user, keep a running total of ``value``; the FIRST time the
    total crosses each configured tier edge, emit exactly one alert row
    (user, tier, crossed_at, running_total-at-crossing).

Semantics are incremental-friendly (state = one double + one bitmask per
user, O(distinct users) forever) yet batch-expressible (cumulative-sum
window + first-crossing row_number), so the streaming operator is
certified by its batch twin (tests/test_streaming_tws.py) and the batch
twin by a DuckDB oracle (queries_events.py: ``tier_crossing_alerts``).

The reference has no streaming at all (SURVEY.md §2.7); this extends the
engine's stateful surface beyond ``applyInPandasWithState``
(streaming/stateful.py) to the API Spark is standardizing on.

Scale shape: state store is keyed by user and partitioned with the
shuffle; emission is append-mode with no timers, so no watermark stalls.
At 100 TB the cost is one shuffle of the event stream by user — the same
as any keyed agg — plus O(users) RocksDB state.

Runtime note: the transformWithState Python protocol needs ``protobuf``
(pyspark.sql.streaming.proto), absent from this container — the
streaming path is import-gated in tests and certified indirectly through
the batch twin; on a real cluster install protobuf and it runs as-is.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

__all__ = ["TIER_EDGES", "ALERT_SCHEMA", "tier_alerts_stream", "tier_alerts_batch"]

#: (tier number, inclusive lower edge) — tier N fires when total >= edge.
TIER_EDGES: list[tuple[int, float]] = [(1, 1000.0), (2, 2500.0), (3, 4500.0)]

ALERT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("tier", T.IntegerType()),
        T.StructField("crossed_at", T.TimestampType()),
        T.StructField("running_total", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("running_total", T.DoubleType()),
        T.StructField("emitted_mask", T.IntegerType()),
    ]
)


def _fold_alerts(
    pdf: "pd.DataFrame", total: float, mask: int
) -> tuple[list[tuple], float, int]:
    """Fold one user's (ts, event_id, value) rows, already arbitrary order,
    into (alerts, new_total, new_mask). Sorts by (ts, event_id) so the
    cumulative order is total and deterministic; sums run left-to-right so
    the batch twin (window cumsum in the same order) matches bit-for-bit.
    """
    import numpy as np

    pdf = pdf.sort_values(["__ts", "__eid"])
    cum = total + np.cumsum(pdf["__val"].to_numpy(dtype=np.float64))
    alerts: list[tuple] = []
    for tier, edge in TIER_EDGES:
        bit = 1 << tier
        if mask & bit or len(cum) == 0:
            continue
        # First index where the running total reaches the edge. A linear
        # first-true scan, NOT searchsorted: with negative event values the
        # cumsum is non-monotonic, so binary search (and a final-total
        # check) could miss or misplace the FIRST crossing.
        hit = cum >= edge
        if not hit.any():
            continue
        i = int(np.argmax(hit))
        alerts.append(
            (
                int(pdf["__uid"].iloc[i]),
                tier,
                pdf["__ts"].iloc[i],
                float(cum[i]),
            )
        )
        mask |= bit
    return alerts, float(cum[-1]) if len(cum) else total, mask


def _prep(
    events: DataFrame,
    ts_col: str,
    user_col: str,
    value_col: str,
    event_id_col: str,
):
    # __eid breaks ties between duplicate timestamps (total order); inputs
    # without an id column fall back to a constant.
    eid_expr = (
        f"{event_id_col} AS __eid"
        if event_id_col is not None and event_id_col in events.columns
        else "CAST(0 AS BIGINT) AS __eid"
    )
    return events.selectExpr(
        f"{user_col} AS __uid",
        f"CAST({ts_col} AS TIMESTAMP) AS __ts",
        eid_expr,
        f"CAST({value_col} AS DOUBLE) AS __val",
    )


def tier_alerts_stream(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Streaming tier alerts via ``transformWithStateInPandas``.

    Needs ``spark.sql.streaming.stateStore.providerClass`` set to the
    RocksDB provider (session.py exposes ``rocksdb_state_conf``).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TierProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("tier_state", _STATE_SCHEMA)

        def handleInputRows(
            self, key, rows: Iterator["pd.DataFrame"], timerValues
        ) -> Iterator["pd.DataFrame"]:
            import pandas as pd

            if self._state.exists():
                total, mask = self._state.get()
            else:
                total, mask = 0.0, 0
            out: list[tuple] = []
            for pdf in rows:
                got, total, mask = _fold_alerts(pdf, total, mask)
                out.extend(got)
            self._state.update((total, mask))
            if out:
                yield pd.DataFrame(
                    out,
                    columns=["user_id", "tier", "crossed_at", "running_total"],
                )

        def close(self) -> None:
            pass

    return (
        _prep(events, ts_col, user_col, value_col, event_id_col)
        .groupBy("__uid")
        .transformWithStateInPandas(
            statefulProcessor=TierProcessor(),
            outputStructType=ALERT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )


def tier_alerts_batch(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    event_id_col: str = "event_id",
) -> DataFrame:
    """Batch twin: window cumsum per user in (ts, event_id) order, then
    the first row per (user, tier) whose running total reaches the edge.
    Pure built-ins — one shuffle (window by user), broadcast edge join,
    ranking filter."""
    prepped = _prep(events, ts_col, user_col, value_col, event_id_col)
    w = Window.partitionBy("__uid").orderBy("__ts", "__eid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = prepped.select(
        F.col("__uid").alias("user_id"),
        F.col("__ts").alias("crossed_at"),
        F.col("__eid").alias("event_id"),
        F.sum("__val").over(w).alias("running_total"),
    )
    # VALUES literal keeps the 3-row edge table JVM-side (no Python-RDD
    # worker spin-up as createDataFrame on local rows would incur).
    edges = F.broadcast(
        cum.sparkSession.sql(
            "SELECT * FROM VALUES {} AS edges(tier, edge)".format(
                ", ".join(
                    f"({t}, CAST({e} AS DOUBLE))" for t, e in TIER_EDGES
                )
            )
        )
    )
    rank_w = Window.partitionBy("user_id", "tier").orderBy(
        "crossed_at", "event_id"
    )
    return (
        cum.join(edges, cum.running_total >= edges.edge)
        .withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "tier",
            "crossed_at",
            F.round("running_total", 2).alias("running_total"),
        )
    )
