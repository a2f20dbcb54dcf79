"""Ordering semantics of the conversion funnel: events must occur
strictly AFTER the previous step's first-touch time and within the
conversion window."""

from __future__ import annotations

from datetime import datetime


def _ev(uid, etype, ts):
    return (uid, etype, datetime.fromisoformat(ts))


def _run(spark, rows):
    from mknssh_11_bigdata_spark.queries_events import (
        conversion_funnel_steps,
    )

    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    v, c, p = conversion_funnel_steps(df)
    return (
        {r.user_id for r in v.collect()},
        {r.user_id for r in c.collect()},
        {r.user_id for r in p.collect()},
    )


def test_funnel_order_and_window_semantics(spark):
    rows = [
        # user 1: perfect in-order funnel inside the window
        _ev(1, "view", "2024-01-01T00:00:00"),
        _ev(1, "click", "2024-01-01T01:00:00"),
        _ev(1, "purchase", "2024-01-01T02:00:00"),
        # user 2: purchase BEFORE the click -> stops at step 2
        _ev(2, "view", "2024-01-01T00:00:00"),
        _ev(2, "purchase", "2024-01-01T00:30:00"),
        _ev(2, "click", "2024-01-01T01:00:00"),
        # user 3: click outside the 24h window -> stops at step 1
        _ev(3, "view", "2024-01-01T00:00:00"),
        _ev(3, "click", "2024-01-02T01:00:00"),
        # user 4: click with NO prior view -> not even step 1
        _ev(4, "click", "2024-01-01T00:00:00"),
        _ev(4, "purchase", "2024-01-01T01:00:00"),
        # user 5: second click (after first view) converts even though
        # an earlier click predates the view
        _ev(5, "click", "2024-01-01T00:00:00"),
        _ev(5, "view", "2024-01-01T01:00:00"),
        _ev(5, "click", "2024-01-01T02:00:00"),
    ]
    views, clicks, purchases = _run(spark, rows)
    assert views == {1, 2, 3, 5}
    assert clicks == {1, 2, 5}
    assert purchases == {1}
